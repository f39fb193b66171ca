package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions._

/** Relational surface: scan/filter/project/slice/take/setitem/fillna/cast/
  * concat/distinct/set-ops/joins/windows/sorts (SURVEY.md §2.1-§2.3, §2.5-
  * §2.7). All plans are pushdown-friendly: filters and projections sit
  * directly over the parquet scan, joins broadcast the dimension side, and
  * nothing collects to the driver.
  */
object Relational {

  /** Nonces of compaction staging dirs created by THIS process — the only
    * dirs the q_layout_compact entry reaper may delete young (cutoffs and
    * rationale live at the gate's comment; foreign leftovers wait out the
    * longer cutoff there). */
  private val compactNonces =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  val defs: Map[String, Q] = Map(
    // §2.1 scan + §2.2 projection/filter: predicate + pruning reach parquet.
    "q_filter_project" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .filter($"l_quantity" > 45 && $"l_discount" < 0.05)
          .select(
            $"l_orderkey", $"l_linenumber", $"l_quantity",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |  l_extendedprice * (1.0 - l_discount) AS revenue
             |FROM lineitem
             |WHERE l_quantity > 45 AND l_discount < 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // §2.2 slice: ORDER BY + OFFSET/LIMIT (reference __getitem__ slice,
    // base.py:1045-1067).
    "q_slice" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .orderBy($"o_orderkey")
          .offset(100).limit(50)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin)),

    // §2.2 take (gather by position list; reference base.py:1215-1270).
    // Scale-safe global positions: range partition + per-partition row
    // numbers + broadcast offsets (operators.Positional) — no
    // single-partition Window.orderBy anywhere in the plan.
    "q_take" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.operators.Positional.takePositions(
            tbl(s, dir, "orders"), Seq($"o_orderkey"),
            Seq(0L, 7L, 3L, 999L, 42L))
          .select($"pos", $"o_orderkey", $"o_totalprice")
          .orderBy($"pos")
      },
      Some("""SELECT pos, o_orderkey, o_totalprice FROM (
             |  SELECT o_orderkey, o_totalprice,
             |         row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
             |  FROM orders)
             |WHERE pos IN (0, 7, 3, 999, 42) ORDER BY pos""".stripMargin)),

    // §2.2 take under a COMPOSITE sort key: same codegen sampled-splits
    // plan — buckets from the leading column's splits, remaining sort
    // columns tie-break inside the per-bucket window (no RDD fallback,
    // no zipWithIndex row boxing).
    "q_take_multi" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.operators.Positional.takePositions(
            tbl(s, dir, "lineitem")
              .select($"l_orderkey", $"l_linenumber", $"l_quantity"),
            Seq($"l_orderkey", $"l_linenumber"),
            Seq(0L, 1L, 2L, 500L, 2500L, 5999L))
          .select($"pos", $"l_orderkey", $"l_linenumber", $"l_quantity")
          .orderBy($"pos")
      },
      Some("""SELECT pos, l_orderkey, l_linenumber, l_quantity FROM (
             |  SELECT l_orderkey, l_linenumber, l_quantity,
             |         row_number() OVER (ORDER BY l_orderkey, l_linenumber)
             |           - 1 AS pos
             |  FROM lineitem)
             |WHERE pos IN (0, 1, 2, 500, 2500, 5999) ORDER BY pos""".stripMargin)),

    // §2.2 scatter/update (reference __setitem__ → immutable CASE WHEN).
    "q_setitem" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .select(
            $"o_orderkey",
            when($"o_orderstatus" === "F", $"o_totalprice" * 1.1)
              .otherwise($"o_totalprice").as("price_adj"),
            when($"o_totalprice" > 100000.0, lit("big"))
              .otherwise(lit("small")).as("bucket"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 1.1
             |       ELSE o_totalprice END AS price_adj,
             |  CASE WHEN o_totalprice > 100000.0 THEN 'big'
             |       ELSE 'small' END AS bucket
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // §2.2 isna + fillna(value): nulls synthesized with CASE, then coalesce.
    "q_isna_fillna" -> Q(
      (s, dir) => {
        import s.implicits._
        val v = when($"value" < 10.0, lit(null)).otherwise($"value")
        tbl(s, dir, "events")
          .select(
            $"event_id",
            v.isNull.as("is_na"),
            coalesce(v, lit(-1.0)).as("filled"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
             |  (CASE WHEN value < 10.0 THEN NULL ELSE value END) IS NULL AS is_na,
             |  COALESCE(CASE WHEN value < 10.0 THEN NULL ELSE value END, -1.0) AS filled
             |FROM events ORDER BY event_id""".stripMargin)),

    // §2.2 directional fillna (ffill/bfill) as running window fills.
    "q_ffill" -> Q(
      (s, dir) => {
        import s.implicits._
        val v = when($"value" < 20.0, lit(null)).otherwise($"value")
        tbl(s, dir, "events")
          .withColumn("v", v)
          .select(
            $"event_id", $"user_id",
            ffill($"v", Seq($"user_id"), Seq($"ts", $"event_id")).as("v_ffill"),
            bfill($"v", Seq($"user_id"), Seq($"ts", $"event_id")).as("v_bfill"),
            $"v", $"ts")
          .transform(d => ffillLimit(d, $"v", 1, Seq($"user_id"),
            Seq($"ts", $"event_id"), "v_ffill_lim1"))
          .drop("v", "ts")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id, v_ffill, v_bfill,
             |  CASE WHEN v IS NOT NULL THEN v
             |       WHEN rn - lastnn <= 1 THEN v_ffill END AS v_ffill_lim1
             |FROM (
             |  SELECT *,
             |    last_value(v IGNORE NULLS) OVER w AS v_ffill,
             |    first_value(v IGNORE NULLS) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id
             |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_bfill,
             |    max(CASE WHEN v IS NOT NULL THEN rn END) OVER w AS lastnn
             |  FROM (
             |    SELECT *, row_number() OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |    FROM (SELECT *, CASE WHEN value < 20.0 THEN NULL ELSE value
             |          END AS v FROM events))
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |ORDER BY event_id""".stripMargin)),

    // §2.2 cast. Spark double→int truncates toward zero; the oracle pins the
    // same semantics with TRUNC.
    "q_cast" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .select(
            $"l_orderkey", $"l_linenumber",
            $"l_quantity".cast(IntegerType).as("qty_int"),
            $"l_orderkey".cast(StringType).as("key_str"),
            $"l_shipdate".cast(DateType).as("ship_date"),
            $"l_linenumber".cast(DoubleType).as("line_dbl"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(TRUNC(l_quantity) AS INTEGER) AS qty_int,
             |  CAST(l_orderkey AS VARCHAR) AS key_str,
             |  CAST(l_shipdate AS DATE) AS ship_date,
             |  CAST(l_linenumber AS DOUBLE) AS line_dbl
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // §2.2 concat (zero-copy chunk union in the reference ≈ zero-shuffle
    // UNION ALL here).
    "q_union_all" -> Q(
      (s, dir) => {
        import s.implicits._
        val o = tbl(s, dir, "orders")
        o.filter($"o_orderstatus" === "F").select($"o_orderkey", $"o_totalprice")
          .union(o.filter($"o_totalprice" > 200000.0)
            .select($"o_orderkey", $"o_totalprice"))
          .orderBy($"o_orderkey", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
             |UNION ALL
             |SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 200000.0
             |ORDER BY o_orderkey, o_totalprice""".stripMargin)),

    // §2.7 set ops: INTERSECT / EXCEPT (distinct semantics both engines).
    "q_set_ops" -> Q(
      (s, dir) => {
        import s.implicits._
        val li = tbl(s, dir, "lineitem")
        val o = tbl(s, dir, "orders")
        val a = li.filter($"l_quantity" > 30).select($"l_orderkey".as("k"))
        val b = o.filter($"o_totalprice" > 150000.0).select($"o_orderkey".as("k"))
        a.intersect(b).withColumn("op", lit("both"))
          .union(a.except(b).withColumn("op", lit("only_li")))
          .orderBy($"op", $"k")
      },
      Some("""SELECT k, 'both' AS op FROM (
             |  SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 30
             |  INTERSECT
             |  SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 150000.0)
             |UNION ALL
             |SELECT k, 'only_li' AS op FROM (
             |  SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 30
             |  EXCEPT
             |  SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 150000.0)
             |ORDER BY op, k""".stripMargin)),

    // §2.4 unique / distinct.
    "q_distinct" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "customer").select($"c_mktsegment").distinct()
          .orderBy($"c_mktsegment")
      },
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment")),

    // §2.4 value_counts.
    "q_value_counts" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "part").groupBy($"p_brand")
          .agg(count(lit(1)).as("cnt"))
          .orderBy($"cnt".desc, $"p_brand")
      },
      Some("""SELECT p_brand, COUNT(*) AS cnt FROM part
             |GROUP BY p_brand ORDER BY cnt DESC, p_brand""".stripMargin)),

    // §2.4 factorize (dictionary-encode): dense codes assigned in sort order
    // on the small DISTINCT dictionary side (operators.Positional.factorize),
    // broadcast-joined back — the big table never sees a global window.
    "q_factorize" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.operators.Positional.factorize(
            tbl(s, dir, "part").select($"p_partkey", $"p_type"), "p_type")
          .select($"p_partkey", $"p_type", $"code")
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, p_type,
             |  dense_rank() OVER (ORDER BY p_type) - 1 AS code
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // §2.4 factorize at UNBOUNDED cardinality: the shuffle-join spelling —
    // dense codes are global positions of the distinct values (codegen
    // sampled-splits over the distinct side, no driver dictionary, no
    // broadcast). factorize() auto-switches to this path above
    // maxCategories; gated explicitly so both spellings stay oracle-green.
    "q_factorize_shuffle" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.operators.Positional.factorizeShuffle(
            tbl(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            "o_custkey")
          .select($"o_orderkey", $"o_custkey", $"code")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  dense_rank() OVER (ORDER BY o_custkey) - 1 AS code
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // §2.3 joins — broadcast the dims, let AQE/Catalyst pick the big-side
    // strategy. Revenue per nation (TPC-H Q5 flavor).
    "q_join_broadcast" -> Q(
      (s, dir) => {
        import s.implicits._
        val c = tbl(s, dir, "customer")
        val o = tbl(s, dir, "orders")
        val li = tbl(s, dir, "lineitem")
        val n = tbl(s, dir, "nation")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(
            detSum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
              .as("revenue"),
            count(lit(1)).as("cnt"))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS cnt
             |FROM lineitem, orders, customer, nation
             |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             |  AND c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // §2.3 co-located bucketed join, oracle-gated end to end: both sides
    // are written as bucketed catalog tables on the join key (the
    // pay-the-shuffle-once layout for fact tables joined query after
    // query at 100 TB) and joined back from the catalog — the zero-
    // Exchange SortMergeJoin plan shape is pinned by BucketingSpec; this
    // gate pins that the bucketed PATH (write → catalog read → co-located
    // join) produces hash-identical results to the oracle joining the
    // original parquet. Values go through decimal (association-
    // independent) like every cross-engine sum.
    "q_join_bucketed" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.sources.Bucketing.writeBucketed(
          tbl(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
          "graft_gate_b_orders", Seq("o_orderkey"), 8, Seq("o_orderkey"))
        graft.sources.Bucketing.writeBucketed(
          tbl(s, dir, "lineitem").select($"l_orderkey", $"l_quantity",
            $"l_extendedprice"),
          "graft_gate_b_lineitem", Seq("l_orderkey"), 8, Seq("l_orderkey"))
        val o = graft.sources.Bucketing.readBucketed(s, "graft_gate_b_orders")
        val li = graft.sources.Bucketing
          .readBucketed(s, "graft_gate_b_lineitem")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_items"),
            detSum($"l_quantity").as("sum_qty"),
            detSum($"l_extendedprice").as("sum_price"))
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey, COUNT(*) AS n_items,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
             |    AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
             |    AS sum_price
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // §2.3 semi/anti joins (EXISTS / NOT EXISTS).
    "q_join_semi_anti" -> Q(
      (s, dir) => {
        import s.implicits._
        val c = tbl(s, dir, "customer")
        val bigOrders = tbl(s, dir, "orders").filter($"o_totalprice" > 250000.0)
        c.join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", lit("has_big") as "tag")
          .union(
            c.join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
              .select($"c_custkey", lit("no_big") as "tag"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, 'has_big' AS tag FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |              AND o_totalprice > 250000.0)
             |UNION ALL
             |SELECT c_custkey, 'no_big' AS tag FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                  AND o_totalprice > 250000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // §2.1 sequence ingest (_from_sequence analogue), oracle-gated with a
    // table-free VALUES oracle: a typed in-memory sequence becomes a
    // distributed Dataset whose contents must match the literal rows.
    "q_sequence_ingest" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.sources.ArrowInterop.fromSequence(s, Seq(
            (1L, "alpha", 1.5), (2L, "beta", -2.25), (3L, "gamma", 0.0)))
          .toDF("id", "name", "score")
          .orderBy($"id")
      },
      Some("""SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'alpha', 1.5),
             |                      (2, 'beta', -2.25), (3, 'gamma', 0.0))
             |  AS t(id, name, score) ORDER BY id""".stripMargin)),

    // §2.1 Arrow IPC boundary, oracle-gated: egress the nation table as a
    // self-contained Arrow IPC stream, re-ingest it, and the oracle reads
    // the same parquet directly — the round-trip must be value-identical
    // (the reference's __arrow_array__ / pandas_from_arrow contract).
    // Boundary op by design: tiny dimension table, driver materialization
    // is the contract, not a scale path.
    "q_arrow_roundtrip" -> Q(
      (s, dir) => {
        val bytes = graft.sources.ArrowInterop.toArrow(
          tbl(s, dir, "nation"))
        graft.sources.ArrowInterop.fromArrow(s, bytes)
          .orderBy(col("n_nationkey"))
      },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    // §2.3 extension: skew-safe salted join (operators.Skew.saltedJoin) —
    // the planned-ahead mitigation for power-law join keys: fact rows get a
    // deterministic salt, the dimension explodes ×saltFactor, and the
    // result is EXACTLY the plain equi-join (which is what the oracle
    // runs). Revenue per supplier nation through the salted path.
    "q_salted_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val li = tbl(s, dir, "lineitem")
          .select($"l_suppkey", $"l_extendedprice")
        val supp = tbl(s, dir, "supplier")
          .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
        graft.operators.Skew.saltedJoin(li, supp, Seq("l_suppkey"),
            saltFactor = 4)
          .groupBy($"s_nationkey")
          .agg(detSum($"l_extendedprice").as("revenue"),
            count(lit(1)).as("cnt"))
          .orderBy($"s_nationkey")
      },
      Some("""SELECT s_nationkey,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
             |    AS revenue,
             |  COUNT(*) AS cnt
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // §2.3 extension: as-of join (operators.AsofJoin) — each click joined
    // to the user's most recent preceding error. Spark lacks the operator;
    // the union+window decomposition is one |L|+|R| shuffle with zero row
    // multiplication (vs the range-join cross-product blowup). DuckDB has
    // native ASOF JOIN, so the oracle gates full values, not just rows.
    // events.ts reads as canonical nanos-long (queries.canonicalizeTime
    // absorbs the parquet unit); outputs normalize to microsecond
    // timestamps exactly (integer div).
    "q_asof_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val ev = tbl(s, dir, "events")
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"ts",
            $"event_id".as("err_id"), $"value".as("err_value"))
        graft.operators.AsofJoin.asof(clicks, errors, Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            rightPayload = Seq("err_id", "err_value"))
          .select($"event_id", $"user_id",
            timestamp_micros(expr("ts div 1000")).as("event_time"),
            $"asof_err_id".as("prev_error_id"),
            $"asof_err_value".as("prev_error_value"),
            timestamp_micros(expr("asof_ts div 1000")).as("prev_error_time"))
          .orderBy($"event_id")
      },
      Some("""SELECT l.event_id, l.user_id, l.ts AS event_time,
             |  r.event_id AS prev_error_id, r.value AS prev_error_value,
             |  r.ts AS prev_error_time
             |FROM (SELECT * FROM events WHERE event_type = 'click') l
             |ASOF LEFT JOIN
             |     (SELECT * FROM events WHERE event_type = 'error') r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // §2.3 extension: as-of NEAREST direction (pandas merge_asof parity —
    // DuckDB has no native nearest, so the oracle composes a backward and
    // a forward ASOF join and picks the smaller gap, backward on ties:
    // an independent spelling of the same semantics). Same one-shuffle
    // union+window plan; the two direction fills share the hash exchange.
    "q_asof_nearest" -> Q(
      (s, dir) => {
        import s.implicits._
        val ev = tbl(s, dir, "events")
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"ts", $"event_id".as("err_id"))
        graft.operators.AsofJoin.asof(clicks, errors, Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            rightPayload = Seq("err_id"), direction = "nearest")
          .select($"event_id", $"user_id",
            $"asof_err_id".as("near_error_id"),
            timestamp_micros(expr("asof_ts div 1000")).as("near_error_time"))
          .orderBy($"event_id")
      },
      Some("""WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
             |     r AS (SELECT * FROM events WHERE event_type = 'error'),
             |b AS (SELECT l.event_id, l.user_id, l.ts,
             |             r.event_id AS b_id, r.ts AS b_ts
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND l.ts >= r.ts),
             |f AS (SELECT l.event_id, r.event_id AS f_id, r.ts AS f_ts
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND l.ts <= r.ts)
             |SELECT b.event_id, b.user_id,
             |  CASE WHEN f_ts IS NULL THEN b_id
             |       WHEN b_ts IS NULL THEN f_id
             |       WHEN b.ts - b_ts <= f_ts - b.ts THEN b_id
             |       ELSE f_id END AS near_error_id,
             |  CASE WHEN f_ts IS NULL THEN b_ts
             |       WHEN b_ts IS NULL THEN f_ts
             |       WHEN b.ts - b_ts <= f_ts - b.ts THEN b_ts
             |       ELSE f_ts END AS near_error_time
             |FROM b JOIN f USING (event_id)
             |ORDER BY event_id""".stripMargin)),

    // §2.3 extension: point-in-interval range join (operators.RangeJoin) —
    // clicks within 10 minutes after an error, per user. Bin blocking makes
    // this an equi-join on (key, bin) + a narrow exact filter; the naive
    // BETWEEN join re-filters the full per-key cross product. binWidth =
    // the interval length, so each interval explodes to ≤ 2 bins.
    "q_range_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val tenMinNs = 600L * 1000 * 1000 * 1000
        val ev = tbl(s, dir, "events")
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id".as("click_id"), $"user_id", $"ts")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"ts".as("err_start"),
            ($"ts" + lit(tenMinNs)).as("err_end"),
            $"event_id".as("error_id"))
        graft.operators.RangeJoin.pointInInterval(clicks, errors,
            Seq("user_id"), "ts", "err_start", "err_end",
            binWidth = tenMinNs)
          .select($"click_id", $"iv_error_id".as("error_id"), $"user_id",
            timestamp_micros(expr("ts div 1000")).as("click_time"))
          .orderBy($"click_id", $"error_id")
      },
      Some("""SELECT c.event_id AS click_id, e.event_id AS error_id,
             |  c.user_id, c.ts AS click_time
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |JOIN (SELECT * FROM events WHERE event_type = 'error') e
             |  ON c.user_id = e.user_id
             | AND c.ts BETWEEN e.ts AND e.ts + INTERVAL 10 MINUTE
             |ORDER BY click_id, error_id""".stripMargin)),

    // §2.5 extension: gap-based sessionization (operators.Sessionize) —
    // 30-minute-gap user sessions over the event stream, reduced to
    // per-session stats. One shuffle + one sort; the batch analog of
    // streaming session windows.
    "q_sessionize" -> Q(
      (s, dir) => {
        import s.implicits._
        val halfHourNs = 1800L * 1000 * 1000 * 1000
        graft.operators.Sessionize.sessionize(
            tbl(s, dir, "events").select($"user_id", $"ts"),
            Seq("user_id"), "ts", gap = halfHourNs)
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"),
            min($"ts").as("s_ns"), max($"ts").as("e_ns"))
          .select($"user_id", $"session_id", $"n_events",
            timestamp_micros(expr("s_ns div 1000")).as("session_start"),
            timestamp_micros(expr("e_ns div 1000")).as("session_end"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, ts,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS nw
             |  FROM events),
             |sessions AS (
             |  SELECT user_id, ts,
             |    CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY ts
             |         ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT) AS session_id
             |  FROM flagged)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |       MIN(ts) AS session_start, MAX(ts) AS session_end
             |FROM sessions GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // §2.5 windows: ranking + lag + running sum (running double sum is
    // order-pinned by the unique (o_orderdate, o_orderkey) sort both sides).
    "q_window" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        tbl(s, dir, "orders")
          .select(
            $"o_orderkey", $"o_custkey",
            row_number().over(w).as("rn"),
            lag($"o_totalprice", 1).over(w).as("prev_price"),
            // decimal running sum: DuckDB evaluates window sums with a
            // segment tree (pairwise order) — exact decimal makes the result
            // association-independent on both engines.
            sum($"o_totalprice".cast(DecimalType(38, 4)))
              .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, 0)).cast(DoubleType).as("running_total"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  row_number() OVER w AS rn,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) OVER
             |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // §2.6 top-k: Spark plans TakeOrderedAndProject — no full sort at scale.
    "q_topk" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(10)
          .select($"o_orderkey", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // §2.6 extension: top-k PER GROUP (the pipeline spelling of "best 3
    // documents per language"): rank window partitioned by the group key —
    // fully parallel across groups, never a global sort; the filter on
    // row_number keeps only k rows per group on the reduce side.
    "q_group_topk" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"o_orderpriority")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        tbl(s, dir, "orders")
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 3)
          .select($"o_orderpriority", $"rk", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_orderpriority", $"rk")
      },
      Some("""SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |    CAST(row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
             |  FROM orders)
             |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin)),

    // §2.8.5 date functions (beyond-parity; storage-only in the reference).
    "q_date_parts" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .select(
            $"o_orderkey",
            year($"o_orderdate").as("y"),
            month($"o_orderdate").as("m"),
            dayofmonth($"o_orderdate").as("d"),
            date_trunc("month", $"o_orderdate").as("month_start"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INTEGER) AS y,
             |  CAST(month(o_orderdate) AS INTEGER) AS m,
             |  CAST(day(o_orderdate) AS INTEGER) AS d,
             |  date_trunc('month', o_orderdate) AS month_start
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // §2.2/§2.8.4 UNPIVOT (wide→long reshape, pandas melt analog): three
    // measure columns become (measure, val) rows. A pure narrow Expand —
    // each input row emits its unpivoted rows in place, no shuffle until
    // the gate's own ORDER BY — so it scales as a map-side transform.
    // Spark's unpivot KEEPS null measure values (unlike SQL UNPIVOT's
    // default); the oracle mirrors with INCLUDE NULLS so the contract is
    // pinned even though the gate columns happen to be dense.
    "q_unpivot" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity",
            $"l_discount", $"l_tax")
          .unpivot(
            Array($"l_orderkey", $"l_linenumber"),
            Array($"l_quantity", $"l_discount", $"l_tax"),
            "measure", "val")
          .orderBy($"l_orderkey", $"l_linenumber", $"measure", $"val")
      },
      Some("""SELECT l_orderkey, l_linenumber, measure, val
             |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
             |        l_tax FROM lineitem)
             |UNPIVOT INCLUDE NULLS (val FOR measure IN
             |  (l_quantity, l_discount, l_tax))
             |ORDER BY l_orderkey, l_linenumber, measure, val""".stripMargin)),

    // §2.2 step-slice (reference base.py:1045-1067 step≠1 path): every k-th
    // row under a total order — global positions via operators.Positional
    // (parallel), then pos % k. The oracle may use a window (DuckDB is the
    // single-node referee, not the scale target).
    "q_slice_step" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.operators.Positional.withGlobalPos(
            tbl(s, dir, "orders").select($"o_orderkey", $"o_totalprice"),
            Seq($"o_orderkey"), "pos")
          .filter($"pos" % 3 === 0)
          .select($"pos", $"o_orderkey", $"o_totalprice")
          .orderBy($"pos")
      },
      Some("""SELECT pos, o_orderkey, o_totalprice FROM (
             |  SELECT o_orderkey, o_totalprice,
             |         row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
             |  FROM orders)
             |WHERE pos % 3 = 0 ORDER BY pos""".stripMargin)),

    // §2.8.5 JSON + timestamp scalar surface (beyond-parity): JSON path
    // extraction over the events props column; canonical nanos-long ts
    // normalized exactly via integer division (see queries.canonicalizeTime).
    "q_json_props" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "events")
          .filter($"event_type".isin("click", "view"))
          .select(
            $"event_id",
            timestamp_micros(expr("ts div 1000")).as("event_time"),
            $"event_type",
            get_json_object($"props", "$.k").cast("int").as("k"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, ts AS event_time, event_type,
             |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |FROM events WHERE event_type IN ('click', 'view')
             |ORDER BY event_id""".stripMargin)),

    // §2.2 list flatten (reference base.py:1272-1276): explode a list column
    // to one row per element with position — narrow per-partition expansion,
    // no shuffle (operators.Reshape.explodeWithPos).
    "q_explode" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.operators.Reshape.explodeWithPos(
            tbl(s, dir, "part"), split($"p_name", " "),
            Seq($"p_partkey"), "pos", "tok")
          .orderBy($"p_partkey", $"pos")
      },
      Some("""SELECT p_partkey,
             |  CAST(unnest(range(len(string_split(p_name, ' ')))) AS INTEGER) AS pos,
             |  unnest(string_split(p_name, ' ')) AS tok
             |FROM part ORDER BY p_partkey, pos""".stripMargin)),

    // Z-order (Morton) layout key: the bit-interleaved clustering value
    // operators.Layout.clusterByZ range-partitions files by, giving every
    // written file a tight min/max box in BOTH dimensions — the write-time
    // layout that makes a parquet scan prune on either column at 100 TB
    // (ZOrderSpec measures the footer-level pruning win; this gate pins the
    // key's integer arithmetic bitwise cross-engine). Pure codegen'd
    // shift/mask projection — no shuffle beyond the output ORDER BY.
    "q_layout_zorder" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber",
            graft.operators.Layout.zValue(
              Seq($"l_partkey", $"l_suppkey"), bits = 16).as("zval"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some {
        def pm(c: String) = s"((($c % 65536) + 65536) % 65536)"
        s"""SELECT l_orderkey, l_linenumber,
           |  list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(range(0, 16), j ->
           |      (((${pm("l_partkey")} >> j) & 1) << (j * 2)) |
           |      (((${pm("l_suppkey")} >> j) & 1) << (j * 2 + 1)))),
           |    (a, x) -> a | x) AS zval
           |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
      }),

    // Small-file compaction under the oracle (the last layout component
    // that was spec-only): fragment documents into 16 small files in a
    // staging dir, Layout.compact them to ~target size, write, read BACK,
    // and emit every row's (doc_id, md5(text)) — so a compaction that
    // drops, duplicates, or corrupts ANY row hash-mismatches against
    // DuckDB reading the source of truth. The file-count invariant rides
    // as data (q_sketches' exact-values + in-bound-boolean pattern: the
    // oracle can't list files, so it asserts literal TRUE and Spark
    // computes the real predicate). Staging dirs are sf-suffixed like the
    // oracle side-tables AND nonce-suffixed per invocation: unlike the
    // side-tables (tmp→rename swap), these dirs are read BACK lazily by
    // the returned plan, so two concurrent same-scale invocations (bench
    // sampling overlapping a verify run) would otherwise interleave one
    // run's overwrite-delete with the other's read-back. Reaping is
    // scoped: dirs whose nonce THIS process created go at a 2-hour
    // cutoff (an earlier invocation in this JVM has been collected long
    // before that; 2 h leaves a full hour of margin over the longest
    // observed run class — an hour, on a loaded machine — so a live
    // concurrent SAME-JVM invocation near that duration is never raced
    // by a sibling's reap), while foreign dirs wait out 3 hours —
    // a wall-clock cutoff short enough to race a live concurrent
    // PROCESS must not delete a dir this process did not create,
    // because dir mtime is set at write and never refreshed by the
    // later lazy read-back; 3 h keeps that margin without letting a day
    // of separate-JVM bench/verify runs pile staged copies up. Nonce
    // membership is SNAPSHOTTED before the sweep and a nonce leaves the
    // tracking set only when NO surviving dir still carries it —
    // reaping the first dir of a src/out pair must not reclassify the
    // same-nonce sibling as foreign mid-sweep (it would then wait the
    // 3 h cutoff instead of being reaped with its pair).
    "q_layout_compact" -> Q(
      (s, dir) => {
        import s.implicits._
        val sfx = new java.io.File(dir).getName
        val stagingRoot = new java.io.File("/root/repo/target/staging")
        def rmTree(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
          f.delete(): Unit
        }
        val ownCutoff = System.currentTimeMillis() - 2L * 3600 * 1000
        val deadCutoff = System.currentTimeMillis() - 3L * 3600 * 1000
        val ownNonces = { // snapshot: a mid-sweep remove must not
          import scala.jdk.CollectionConverters._ // reclassify a sibling
          compactNonces.iterator().asScala.toSet
        }
        def nonceOf(f: java.io.File) = f.getName.split('_').last
        val staged = Option(stagingRoot.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("compact_"))
        val reaped = staged.filter(f =>
          if (ownNonces.contains(nonceOf(f))) f.lastModified < ownCutoff
          else f.lastModified < deadCutoff)
        reaped.foreach(rmTree)
        // prune a nonce only once BOTH dirs carrying it are gone
        val surviving = staged.filterNot(reaped.contains).map(nonceOf).toSet
        for (n <- reaped.map(nonceOf).distinct if !surviving.contains(n))
          compactNonces.remove(n): Unit
        val nonce = java.util.UUID.randomUUID().toString.take(8)
        compactNonces.add(nonce): Unit
        val frag = s"/root/repo/target/staging/compact_src_${sfx}_$nonce"
        val out = s"/root/repo/target/staging/compact_out_${sfx}_$nonce"
        tbl(s, dir, "documents").repartition(16)
          .write.mode("overwrite").parquet(frag)
        val fragDf = s.read.parquet(frag)
        val preFiles = fragDf.inputFiles.length
        graft.operators.Layout.compact(fragDf, targetBytes = 512L << 20)
          .write.mode("overwrite").parquet(out)
        val post = s.read.parquet(out)
        val postFiles = post.inputFiles.length
        post.select($"doc_id", md5($"text").as("text_md5"),
            lit(postFiles >= 1 && postFiles < preFiles)
              .as("files_compacted"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, md5(text) AS text_md5,
             |       TRUE AS files_compacted
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // §2.3 beyond-parity fuzzy join (record linkage): edit-distance ≤ 1
    // self-join on supplier names via deletion-neighborhood blocking
    // (operators.Fuzzy — complete candidate generation, exact levenshtein
    // verify). The oracle brute-forces the θ-join (DuckDB is the single-node
    // referee; the Spark plan is the linear blocked shape — three hash
    // joins, text out of the wide shuffle, no BNLJ).
    "q_fuzzy_join" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.operators.Fuzzy.edSelfJoin(
            tbl(s, dir, "supplier").select($"s_suppkey", $"s_name"),
            "s_suppkey", "s_name")
          .select($"id1".as("k1"), $"id2".as("k2"), $"ed".cast("long").as("ed"))
          .orderBy($"k1", $"k2")
      },
      Some("""SELECT a.s_suppkey AS k1, b.s_suppkey AS k2,
             |  CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS ed
             |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
             |WHERE levenshtein(a.s_name, b.s_name) <= 1
             |ORDER BY k1, k2""".stripMargin)),

    // §2.5 beyond-parity time-series resample (pandas resample().mean() +
    // ffill() parity): hourly buckets per user, densified per-user grid via
    // a sequence generator, gap buckets at count 0 with the mean
    // forward-filled. Decimal bucket sums keep the mean engine-identical;
    // buckets are exact 64-bit floors (see operators.Resample).
    "q_resample" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.operators.Resample.resample(
            tbl(s, dir, "events").select($"user_id", $"ts", $"value"),
            "user_id", "ts", stepNs = 3600L * 1000 * 1000 * 1000, "value")
          .select($"user_id",
            timestamp_micros(expr("bucket_ns div 1000")).as("bucket"),
            $"n_events", $"v_mean", $"v_ffill")
          .orderBy($"user_id", $"bucket")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) * 1000 AS tns, value FROM events),
             |b AS (
             |  SELECT user_id, tns - tns % 3600000000000 AS bucket_ns,
             |         count(*) AS n_events,
             |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             |           / count(*) AS v_mean
             |  FROM e GROUP BY 1, 2),
             |g AS (
             |  SELECT user_id,
             |         unnest(generate_series(min(bucket_ns), max(bucket_ns),
             |                                3600000000000)) AS bucket_ns
             |  FROM b GROUP BY user_id)
             |SELECT g.user_id, make_timestamp(g.bucket_ns // 1000) AS bucket,
             |       coalesce(b.n_events, 0) AS n_events, b.v_mean,
             |       last_value(b.v_mean IGNORE NULLS) OVER (
             |         PARTITION BY g.user_id ORDER BY g.bucket_ns
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |         AS v_ffill
             |FROM g LEFT JOIN b USING (user_id, bucket_ns)
             |ORDER BY user_id, bucket""".stripMargin)),

    // §2.5 beyond-parity OHLC downsample (pandas resample().ohlc() parity,
    // the market-data/sensor rollup shape): per (user, hour) first/max/min/
    // last of `value`, order pinned by (ts, event_id) so open/close are
    // engine-deterministic. Both row_number windows share one hash
    // partitioning with the final aggregate — a single Exchange on
    // (user_id, bucket_ns), two in-partition sorts, then the agg reuses the
    // partitioning.
    "q_ohlc" -> Q(
      (s, dir) => {
        import s.implicits._
        val step = 3600L * 1000 * 1000 * 1000
        val keyed = tbl(s, dir, "events")
          .select($"user_id", $"ts", $"event_id", $"value")
          .withColumn("bucket_ns", $"ts" - ($"ts" % step))
        val wa = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"bucket_ns")
          .orderBy($"ts", $"event_id")
        val wd = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"bucket_ns")
          .orderBy($"ts".desc, $"event_id".desc)
        keyed
          .withColumn("rn_a", row_number().over(wa))
          .withColumn("rn_d", row_number().over(wd))
          .groupBy($"user_id", $"bucket_ns")
          .agg(
            max(when($"rn_a" === 1, $"value")).as("open"),
            max($"value").as("high"),
            min($"value").as("low"),
            max(when($"rn_d" === 1, $"value")).as("close"),
            count(lit(1)).as("n_events"))
          .select($"user_id",
            timestamp_micros(expr("bucket_ns div 1000")).as("bucket"),
            $"open", $"high", $"low", $"close", $"n_events")
          .orderBy($"user_id", $"bucket")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) * 1000 AS tns, ts, event_id,
             |         value
             |  FROM events),
             |k AS (
             |  SELECT user_id, tns - tns % 3600000000000 AS bucket_ns, ts,
             |         value,
             |         row_number() OVER (
             |           PARTITION BY user_id, tns - tns % 3600000000000
             |           ORDER BY ts, event_id) AS rn_a,
             |         row_number() OVER (
             |           PARTITION BY user_id, tns - tns % 3600000000000
             |           ORDER BY ts DESC, event_id DESC) AS rn_d
             |  FROM e)
             |SELECT user_id, make_timestamp(bucket_ns // 1000) AS bucket,
             |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
             |       max(value) AS high,
             |       min(value) AS low,
             |       max(CASE WHEN rn_d = 1 THEN value END) AS close,
             |       count(*) AS n_events
             |FROM k GROUP BY user_id, bucket_ns
             |ORDER BY user_id, bucket""".stripMargin)),

    // §2.5 beyond-parity linear gap interpolation on the resampled grid
    // (pandas interpolate(method="linear") parity). Every gap is interior
    // (grid spans exactly the occupied [min, max]), so no edge policy; the
    // backward/forward neighbor scans share the ffill window's Exchange.
    "q_interpolate" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.operators.Resample.resampleInterp(
            tbl(s, dir, "events").select($"user_id", $"ts", $"value"),
            "user_id", "ts", stepNs = 3600L * 1000 * 1000 * 1000, "value")
          .select($"user_id",
            timestamp_micros(expr("bucket_ns div 1000")).as("bucket"),
            $"n_events", $"v_interp")
          .orderBy($"user_id", $"bucket")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) * 1000 AS tns, value FROM events),
             |b AS (
             |  SELECT user_id, tns - tns % 3600000000000 AS bucket_ns,
             |         count(*) AS n_events,
             |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             |           / count(*) AS v_mean
             |  FROM e GROUP BY 1, 2),
             |g AS (
             |  SELECT user_id,
             |         unnest(generate_series(min(bucket_ns), max(bucket_ns),
             |                                3600000000000)) AS bucket_ns
             |  FROM b GROUP BY user_id),
             |r AS (
             |  SELECT g.user_id, g.bucket_ns,
             |         coalesce(b.n_events, 0) AS n_events, b.v_mean,
             |         last_value(b.v_mean IGNORE NULLS) OVER wb AS v_ffill,
             |         last_value(CASE WHEN b.v_mean IS NOT NULL
             |                         THEN g.bucket_ns END IGNORE NULLS)
             |           OVER wb AS b_prev,
             |         first_value(CASE WHEN b.v_mean IS NOT NULL
             |                          THEN g.bucket_ns END IGNORE NULLS)
             |           OVER wf AS b_next,
             |         first_value(b.v_mean IGNORE NULLS) OVER wf AS v_next
             |  FROM g LEFT JOIN b USING (user_id, bucket_ns)
             |  WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.bucket_ns
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  wf AS (PARTITION BY g.user_id ORDER BY g.bucket_ns
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, make_timestamp(bucket_ns // 1000) AS bucket,
             |       n_events,
             |       CASE WHEN v_mean IS NOT NULL THEN v_mean
             |            ELSE v_ffill + (v_next - v_ffill) *
             |                 (CAST(bucket_ns - b_prev AS DOUBLE)
             |                  / CAST(b_next - b_prev AS DOUBLE)) END
             |         AS v_interp
             |FROM r ORDER BY user_id, bucket""".stripMargin)),

    // §2.5 beyond-parity rolling time-window aggregate (pandas
    // rolling("1h") parity): per event, the count/sum/mean of the user's
    // trailing hour, inclusive. A RANGE frame over the canonical nanos-long
    // ts — ONE Exchange by user + one Sort. Cost model, honestly: Spark's
    // bounded sliding frames have NO retraction — each row re-aggregates
    // the rows currently IN the frame — so the per-row cost is the frame
    // POPULATION (events in the trailing hour), not the partition length.
    // That is the right trade when the window population is bounded (as
    // here); for keys dense enough that the trailing window holds
    // thousands of rows, pre-bucket with Resample.resample and roll over
    // bucket aggregates instead. Decimal window sums are order-free, so
    // segment-tree (DuckDB) and re-aggregating (Spark) evaluation agree
    // exactly; RANGE (not ROWS) makes equal-ts peers symmetric, so tie
    // order can't change any row's answer.
    "q_rolling" -> Q(
      (s, dir) => {
        import s.implicits._
        val hourMinus1 = 3600L * 1000 * 1000 * 1000 - 1
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts")
          .rangeBetween(-hourMinus1, 0L)
        tbl(s, dir, "events")
          .select($"event_id", $"user_id",
            timestamp_micros(expr("ts div 1000")).as("event_time"),
            count(lit(1)).over(w).as("n_1h"),
            sum($"value".cast(DecimalType(38, 6))).over(w).cast("double")
              .as("sum_1h"))
          .withColumn("mean_1h", $"sum_1h" / $"n_1h")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id, ts AS event_time,
             |  count(*) OVER w AS n_1h,
             |  CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             |    AS sum_1h,
             |  CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             |    / count(*) OVER w AS mean_1h
             |FROM (SELECT event_id, user_id, ts, epoch_us(ts) * 1000 AS tns,
             |        value FROM events)
             |WINDOW w AS (PARTITION BY user_id ORDER BY tns
             |  RANGE BETWEEN 3599999999999 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // §2.5 full ranking-function surface (rank/dense_rank/percent_rank/
    // cume_dist/ntile — the remaining window kinds q_window doesn't touch).
    // rank-family results are PEER-INVARIANT (ties share a value), so the
    // quantity-only order is already deterministic; ntile assigns by row
    // position, so IT gets a total order. Both windows share one hash
    // partitioning — one Exchange, two in-partition sorts.
    "q_rank_ntile" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"l_returnflag").orderBy($"l_quantity")
        val wt = org.apache.spark.sql.expressions.Window
          .partitionBy($"l_returnflag")
          .orderBy($"l_quantity", $"l_orderkey", $"l_linenumber")
        tbl(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber",
            rank().over(w).cast("long").as("rk"),
            dense_rank().over(w).cast("long").as("drk"),
            percent_rank().over(w).as("prk"),
            cume_dist().over(w).as("cd"),
            ntile(4).over(wt).cast("long").as("nt"))
          // (l_orderkey, l_linenumber) is NOT unique in this data — and
          // duplicates can sit in DIFFERENT returnflag partitions, so every
          // window column can differ between them. Sort by ALL output
          // columns: fully-tied rows are identical, so order can't matter.
          .orderBy($"l_orderkey", $"l_linenumber", $"rk", $"nt", $"prk",
            $"cd", $"drk")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  rank() OVER w AS rk, dense_rank() OVER w AS drk,
             |  percent_rank() OVER w AS prk, cume_dist() OVER w AS cd,
             |  CAST(ntile(4) OVER (PARTITION BY l_returnflag
             |    ORDER BY l_quantity, l_orderkey, l_linenumber) AS BIGINT)
             |    AS nt
             |FROM lineitem
             |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
             |ORDER BY l_orderkey, l_linenumber, rk, nt, prk, cd, drk""".stripMargin)),

    // §2.8.5 array scalar surface (beyond the explode path): per-order
    // sorted line-number list + size/membership/element access/join. The
    // collect_list state is bounded (≤ 7 lines per order) and the sort
    // makes the content layout-invariant. The list itself leaves the gate
    // as array_join text — the driver's row comparer is scalar-typed; the
    // array OPS are what's under test, not the container encoding.
    "q_array_ops" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(sort_array(collect_list($"l_linenumber")).as("lines"),
            min($"l_quantity").as("min_qty"))
          .select($"l_orderkey",
            array_join($"lines", ",").as("lines_str"),
            size($"lines").cast("long").as("n_lines"),
            array_contains($"lines", 3).as("has3"),
            element_at($"lines", 1).as("first_line"),
            $"min_qty")
          .orderBy($"l_orderkey")
      },
      Some("""SELECT l_orderkey,
             |  array_to_string(list(l_linenumber ORDER BY l_linenumber),
             |                  ',') AS lines_str,
             |  len(list(l_linenumber)) AS n_lines,
             |  list_contains(list(l_linenumber), 3) AS has3,
             |  (list(l_linenumber ORDER BY l_linenumber))[1] AS first_line,
             |  min(l_quantity) AS min_qty
             |FROM lineitem GROUP BY l_orderkey
             |ORDER BY l_orderkey""".stripMargin)),

    // §2.3 composed star join (the TPC-H Q5 shape): fact ⨝ orders on the
    // shuffle key, dimension hops up the customer→nation→region hierarchy,
    // filter pushed to the orders scan, partial/final decimal revenue agg.
    // Broadcast hints go ONLY on the genuinely bounded dimensions (nation
    // 25 rows, region 5 — constant at every SF). Customer and orders scale
    // WITH the data, so their joins are deliberately left stats-driven:
    // Catalyst broadcasts them at gate scale and shuffle-joins them at
    // 100 TB, both correct — hinting customer would pin a driver-OOM plan
    // at scale.
    "q_star_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val li = tbl(s, dir, "lineitem")
        val ord = tbl(s, dir, "orders").filter($"o_orderstatus" === "O")
        val cust = tbl(s, dir, "customer")
        val nat = tbl(s, dir, "nation")
        val reg = tbl(s, dir, "region")
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(detSum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""SELECT r_name, n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_items
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE o_orderstatus = 'O'
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin)),

    // Beyond-parity keyed upsert (batch CDC merge): updates replace their
    // base rows, untouched keys survive — updates ∪ (base ⟕anti updates),
    // one left-anti hash join + zero-shuffle union (operators.Merge).
    "q_upsert" -> Q(
      (s, dir) => {
        import s.implicits._
        val base = tbl(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
        val upd = base.filter($"o_orderkey" % 10 === 0)
          .select($"o_orderkey", ($"o_totalprice" * 2.0).as("o_totalprice"),
            $"o_orderstatus")
        graft.operators.Merge.upsert(base, upd, "o_orderkey")
          .orderBy($"o_orderkey")
      },
      Some("""WITH upd AS (
             |  SELECT o_orderkey, o_totalprice * 2.0 AS o_totalprice,
             |         o_orderstatus
             |  FROM orders WHERE o_orderkey % 10 = 0)
             |SELECT o_orderkey, o_totalprice, o_orderstatus FROM upd
             |UNION ALL
             |SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
             |WHERE o_orderkey % 10 <> 0
             |ORDER BY o_orderkey""".stripMargin)),

    // Beyond-parity snapshot diff (CDC change detection between two
    // corpus snapshots): one full-outer join on the key, side presence as
    // literal-true flags (payload nulls can't read as absence), null-safe
    // changed comparison, unchanged keys dropped. The synthetic `next`
    // snapshot deletes every 17th key, reprices every 13th, adds a new
    // key per 19th — all three classes exercised.
    "q_snapshot_diff" -> Q(
      (s, dir) => {
        import s.implicits._
        val prev = tbl(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
        val nxt = prev.filter($"o_orderkey" % 17 =!= 0)
          .select($"o_orderkey",
            when($"o_orderkey" % 13 === 0, $"o_totalprice" * 1.5)
              .otherwise($"o_totalprice").as("o_totalprice"),
            $"o_orderstatus")
          .unionByName(prev.filter($"o_orderkey" % 19 === 0)
            .select(($"o_orderkey" + 10000000L).as("o_orderkey"),
              lit(100.0).as("o_totalprice"), lit("O").as("o_orderstatus")))
        graft.operators.Merge.snapshotDiff(prev, nxt, "o_orderkey",
            Seq("o_totalprice", "o_orderstatus"))
          .orderBy($"o_orderkey")
      },
      Some("""WITH nxt AS (
             |  SELECT o_orderkey,
             |         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 1.5
             |              ELSE o_totalprice END AS o_totalprice,
             |         o_orderstatus
             |  FROM orders WHERE o_orderkey % 17 <> 0
             |  UNION ALL
             |  SELECT o_orderkey + 10000000, 100.0, 'O' FROM orders
             |  WHERE o_orderkey % 19 = 0),
             |p AS (SELECT o_orderkey, o_totalprice AS prev_o_totalprice,
             |             o_orderstatus AS prev_o_orderstatus, TRUE AS inp
             |      FROM orders),
             |n AS (SELECT o_orderkey, o_totalprice AS next_o_totalprice,
             |             o_orderstatus AS next_o_orderstatus, TRUE AS inn
             |      FROM nxt),
             |d AS (
             |  SELECT o_orderkey, prev_o_totalprice, next_o_totalprice,
             |         prev_o_orderstatus, next_o_orderstatus,
             |    CASE WHEN inp IS NULL THEN 'added'
             |         WHEN inn IS NULL THEN 'removed'
             |         WHEN NOT (prev_o_totalprice IS NOT DISTINCT FROM
             |                     next_o_totalprice
             |               AND prev_o_orderstatus IS NOT DISTINCT FROM
             |                     next_o_orderstatus)
             |           THEN 'changed' END AS change
             |  FROM p FULL OUTER JOIN n USING (o_orderkey))
             |SELECT * FROM d WHERE change IS NOT NULL
             |ORDER BY o_orderkey""".stripMargin)),

    // Beyond-parity triangle counting over the ED-1 similarity graph
    // (local clustering structure of near-dup clusters): node-iterator
    // wedge join on canonically-oriented edges, closed by an edge probe —
    // two hash joins, each triangle exactly once (operators.Graph).
    "q_triangles" -> Q(
      (s, dir) => {
        import s.implicits._
        val edges = graft.operators.Fuzzy.edSelfJoin(
            tbl(s, dir, "supplier").select($"s_suppkey", $"s_name"),
            "s_suppkey", "s_name")
          .select($"id1", $"id2")
        graft.operators.Graph.triangleCounts(edges, "id1", "id2")
          .orderBy($"node")
      },
      Some("""WITH e AS (
             |  SELECT a.s_suppkey AS k1, b.s_suppkey AS k2
             |  FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
             |  WHERE levenshtein(a.s_name, b.s_name) <= 1),
             |t AS (
             |  SELECT e1.k1 AS x, e1.k2 AS y, e2.k2 AS z
             |  FROM e e1 JOIN e e2 ON e1.k2 = e2.k1
             |  JOIN e e3 ON e3.k1 = e1.k1 AND e3.k2 = e2.k2)
             |SELECT node, count(*) AS n_tri FROM (
             |  SELECT x AS node FROM t UNION ALL SELECT y FROM t
             |  UNION ALL SELECT z FROM t)
             |GROUP BY node ORDER BY node""".stripMargin))
  )
}
