package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions._
import graft.expressions.ProductAgg.prodAgg

/** Reduction surface (SURVEY.md §2.4): sum/min/max/mean/prod/std/var/median/
  * skew/kurt/any/all + grouped aggregation. All double reductions go through
  * the deterministic decimal-sum helpers so partial/final merge order never
  * changes the result (identical plan property on a real cluster).
  */
object Aggregates {

  val defs: Map[String, Q] = Map(
    // Flagship: TPC-H Q1 flavor over lineitem, incl. the reference-quirk mean
    // (denominator counts nulls — reference base.py:504-505).
    "q1_agg" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            detSum($"l_quantity").as("sum_qty"),
            detSum($"l_extendedprice").as("sum_price"),
            detSum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
              .as("sum_disc_price"),
            fletcherMean($"l_quantity").as("mean_qty"),
            min($"l_quantity").as("min_qty"),
            max($"l_quantity").as("max_qty"),
            count(lit(1)).as("cnt"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS mean_qty,
             |  MIN(l_quantity) AS min_qty,
             |  MAX(l_quantity) AS max_qty,
             |  COUNT(*) AS cnt
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Global reductions incl. exact count-distinct.
    "q_reduce_global" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .agg(
            detSum($"l_quantity").as("sum_qty"),
            min($"l_extendedprice").as("min_price"),
            max($"l_extendedprice").as("max_price"),
            count(lit(1)).as("cnt"),
            countDistinct($"l_suppkey").as("n_supp"))
      },
      Some("""SELECT
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
             |  MIN(l_extendedprice) AS min_price,
             |  MAX(l_extendedprice) AS max_price,
             |  COUNT(*) AS cnt,
             |  COUNT(DISTINCT l_suppkey) AS n_supp
             |FROM lineitem""".stripMargin)),

    // prod — the one reduction Spark lacks; custom DeclarativeAggregate.
    // l_linenumber ∈ [1,7] so per-order products are small exact integers
    // (order-independent in double).
    "q_prod" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(prodAgg($"l_linenumber").as("line_prod"))
          .orderBy($"l_orderkey")
      },
      Some("""SELECT l_orderkey, product(CAST(l_linenumber AS DOUBLE)) AS line_prod
             |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // std/var/skew/kurt/median — deterministic moment formulas; the oracle
    // spells out the *same* formula so both engines do identical IEEE ops.
    // l_quantity is integral ⇒ median interpolation is exact.
    "q_stats" -> Q(
      (s, dir) => {
        import s.implicits._
        val li = tbl(s, dir, "lineitem")
        // Moments are algebraic (map-side partial combine); keeping the
        // exact percentile OUT of that aggregate keeps it a HashAggregate —
        // a mixed moments+percentile agg degrades to object buffering of
        // every group's values. The exact median instead comes from a
        // (flag, quantity) frequency histogram via weighted percentile:
        // identical value, only |flags|·|distinct qty| rows ever buffer.
        val mom = li.groupBy($"l_returnflag")
          .agg(
            detVarSamp($"l_quantity").as("var_qty"),
            detStddevSamp($"l_quantity").as("std_qty"),
            detSkewness($"l_quantity").as("skew_qty"),
            detKurtosis($"l_quantity").as("kurt_qty"))
        val med = li.groupBy($"l_returnflag", $"l_quantity")
          .agg(count(lit(1)).as("freq"))
          .groupBy($"l_returnflag")
          .agg(percentile($"l_quantity", lit(0.5), $"freq").as("median_qty"))
        mom.as("m")
          .join(broadcast(med).as("p"),
            $"m.l_returnflag" <=> $"p.l_returnflag")
          .select($"m.l_returnflag".as("l_returnflag"), $"var_qty",
            $"std_qty", $"skew_qty", $"kurt_qty", $"median_qty")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  (s2 - s1*s1/n) / (n - 1.0) AS var_qty,
             |  sqrt((s2 - s1*s1/n) / (n - 1.0)) AS std_qty,
             |  (s3/n - 3.0*(s1/n)*s2/n + 2.0*(s1/n)*(s1/n)*(s1/n))
             |    / ((s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n))) AS skew_qty,
             |  (s4/n - 4.0*(s1/n)*s3/n + 6.0*(s1/n)*(s1/n)*s2/n
             |     - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n))
             |    / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0 AS kurt_qty,
             |  med AS median_qty
             |FROM (
             |  -- The DECIMAL(38,6) sums hop through DECIMAL(38,0) before
             |  -- the DOUBLE cast: DuckDB's decimal->double is the NAIVE
             |  -- two-step (hugeint -> double, then /10^scale), which stops
             |  -- being correctly rounded once sum*10^6 exceeds 2^53 —
             |  -- s3/s4 cross that at sf1 (6.5e10/2.6e12) and the r18
             |  -- full-surface sf1 oracle run caught the kurtosis ulp drift
             |  -- (2615682203940 read back as ...939.9995). Spark's
             |  -- Decimal.toDouble is correctly rounded, so the integral
             |  -- quantity sums hop to scale 0 (exact — l_quantity is
             |  -- integral) where hugeint -> double is exact below 2^53.
             |  -- the scale-0 hop is EXACT only while l_quantity stays
             |  -- integral (a data-generator invariant): guard it loudly,
             |  -- so a future non-integral quantity fails as an oracle
             |  -- error instead of a confusing VAL diff pinned on the
             |  -- engine. error() raises only if the CASE arm evaluates.
             |  SELECT l_returnflag,
             |    CASE WHEN COUNT(CASE WHEN l_quantity <> round(l_quantity)
             |                    THEN 1 END) > 0
             |         THEN error('non-integral l_quantity: the DECIMAL(38,0) hop would round')
             |         ELSE CAST(COUNT(l_quantity) AS DOUBLE) END AS n,
             |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,0)) AS DOUBLE) AS s1,
             |    CAST(CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,0)) AS DOUBLE) AS s2,
             |    CAST(CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,0)) AS DOUBLE) AS s3,
             |    CAST(CAST(SUM(CAST(l_quantity*l_quantity*l_quantity*l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,0)) AS DOUBLE) AS s4,
             |    median(l_quantity) AS med
             |  FROM lineitem GROUP BY l_returnflag)
             |ORDER BY l_returnflag""".stripMargin)),

    // any/all with the reference's null semantics (reference bool.py:14-101):
    // nulls are truthy for any(skipna=False) and never falsify all.
    "q_bool_any_all" -> Q(
      (s, dir) => {
        import s.implicits._
        val b = when($"value" < 5.0, lit(null).cast(BooleanType))
          .otherwise($"value" > 50.0)
        tbl(s, dir, "events")
          .withColumn("b", b)
          .groupBy($"event_type")
          .agg(
            bool_or($"b").as("any_skipna"),
            anyNullIsTrue($"b").as("any_null_true"),
            allNullSkipped($"b").as("all_null_skip"),
            count(lit(1)).as("cnt"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
             |  bool_or(b) AS any_skipna,
             |  bool_or(COALESCE(b, TRUE)) AS any_null_true,
             |  bool_and(COALESCE(b, TRUE)) AS all_null_skip,
             |  COUNT(*) AS cnt
             |FROM (SELECT event_type,
             |        CASE WHEN value < 5.0 THEN NULL ELSE value > 50.0 END AS b
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Beyond-parity grouping-sets surface (free in Spark, graded as scale
    // readiness): rollup with deterministic sums.
    "q_rollup" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(detSum($"o_totalprice").as("sum_price"), count(lit(1)).as("cnt"))
          .orderBy($"o_orderstatus".asc_nulls_first,
            $"o_orderpriority".asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price,
             |  COUNT(*) AS cnt
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // Beyond-parity PIVOT (long→wide reshape, the inverse of q_unpivot):
    // one output column per pivot value, deterministic decimal sums. The
    // pivot values are passed EXPLICITLY — without them Spark runs an extra
    // distinct-scan job over the fact table to discover the domain, which
    // at 100 TB is a full pass you didn't ask for (and caps at
    // spark.sql.pivotMaxValues anyway). With values given, the plan is one
    // ordinary hash aggregate over conditional sums — exactly the SQL the
    // oracle spells out.
    "q_pivot" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(detSum($"o_totalprice"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
             |    THEN CAST(o_totalprice AS DECIMAL(38,4)) END) AS DOUBLE)
             |    AS "F",
             |  CAST(SUM(CASE WHEN o_orderstatus = 'O'
             |    THEN CAST(o_totalprice AS DECIMAL(38,4)) END) AS DOUBLE)
             |    AS "O",
             |  CAST(SUM(CASE WHEN o_orderstatus = 'P'
             |    THEN CAST(o_totalprice AS DECIMAL(38,4)) END) AS DOUBLE)
             |    AS "P"
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Sketch aggregates (beyond-parity, 100 TB profiling): HyperLogLog
    // distinct estimate + quantile sketch. Sketch internals differ across
    // engines by design, so the gate emits the EXACT values plus booleans
    // asserting the sketch landed within its published bound
    // (|approx − exact| ≤ 3·rsd·exact for HLL; integral l_quantity with
    // accuracy 10000 makes the quantile sketch land within one unit). The
    // DuckDB oracle computes the same exact values with literal TRUE bounds,
    // so rows+schema+hash all gate. Error bounds also pinned in SketchSpec.
    "q_sketches" -> Q(
      (s, dir) => {
        import s.implicits._
        val li = tbl(s, dir, "lineitem")
        // Sketch pass: one narrow aggregate — no countDistinct (whose mixed
        // distinct/non-distinct spelling forces an Expand plan) and no exact
        // percentile (which buffers every group's values).
        val sketches = li.groupBy($"l_returnflag")
          .agg(
            approx_count_distinct($"l_partkey", rsd = 0.05).as("hll_raw"),
            percentile_approx($"l_quantity", lit(0.5), lit(10000))
              .as("pq_raw"),
            count(lit(1)).as("cnt"))
        // Exact sides for the bound check, each as a two-stage reduce with
        // map-side partial combine; both end tiny (|flags| rows) so they
        // broadcast into the sketch result.
        val exactDistinct = li.select($"l_returnflag", $"l_partkey").distinct()
          .groupBy($"l_returnflag").agg(count(lit(1)).as("exact_parts"))
        // Exact median from a (flag, quantity) frequency histogram via
        // weighted percentile — identical result to an exact percentile over
        // raw rows, but only |flags|·|distinct quantities| rows ever buffer.
        val exactMedian = li
          .groupBy($"l_returnflag", $"l_quantity").agg(count(lit(1)).as("freq"))
          .groupBy($"l_returnflag")
          .agg(percentile($"l_quantity", lit(0.5), $"freq")
            .as("exact_median_qty"))
        // Null-safe (<=>) keys: all three sides group by the same flag, so a
        // NULL-flag group (legal on general data, absent in TPC-H) must
        // rejoin with itself instead of being dropped by a plain equi-join.
        sketches.as("s")
          .join(broadcast(exactDistinct).as("d"),
            $"s.l_returnflag" <=> $"d.l_returnflag")
          .join(broadcast(exactMedian).as("m"),
            $"s.l_returnflag" <=> $"m.l_returnflag")
          .select(
            $"s.l_returnflag".as("l_returnflag"),
            $"exact_parts",
            (abs($"hll_raw" - $"exact_parts") <= lit(3 * 0.05) * $"exact_parts")
              .as("approx_parts_ok"),
            $"exact_median_qty",
            (abs($"pq_raw" - $"exact_median_qty") <= lit(1.0))
              .as("approx_median_ok"),
            $"cnt")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS exact_parts,
             |  TRUE AS approx_parts_ok,
             |  median(l_quantity) AS exact_median_qty,
             |  TRUE AS approx_median_ok,
             |  COUNT(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Mergeable-sketch ROLLUP (beyond-parity, the 100 TB cube pattern):
    // build one Datasketches-HLL sketch per fine-grained group, then answer
    // the coarser distinct-count by MERGING the stored sketches
    // (hll_union_agg) — never rescanning the fact table. This is what makes
    // sketches usable as materialized state: daily sketches roll up to
    // monthly distincts for free. Gate spelling mirrors q_sketches: exact
    // values + a bound flag (lgConfigK=12 → rsd ≈ 1.04/√4096 ≈ 1.6%), so
    // the DuckDB oracle (exact + literal TRUE) hash-matches.
    "q_sketch_rollup" -> Q(
      (s, dir) => {
        import s.implicits._
        val li = tbl(s, dir, "lineitem")
        val fine = li.groupBy($"l_returnflag", $"l_linestatus")
          .agg(hll_sketch_agg($"l_partkey", lit(12)).as("sk"),
            count(lit(1)).as("cnt"))
        val coarse = fine.groupBy($"l_returnflag")
          .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"),
            sum($"cnt").as("cnt"))
        val exact = li.select($"l_returnflag", $"l_partkey").distinct()
          .groupBy($"l_returnflag").agg(count(lit(1)).as("exact_parts"))
        coarse.as("c")
          .join(broadcast(exact).as("e"),
            $"c.l_returnflag" <=> $"e.l_returnflag")
          .select($"c.l_returnflag".as("l_returnflag"),
            $"exact_parts",
            (abs($"est" - $"exact_parts") <= lit(3 * 0.0163) * $"exact_parts")
              .as("merged_est_ok"),
            $"cnt")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS exact_parts,
             |  TRUE AS merged_est_ok,
             |  COUNT(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Per-key z-score outlier flagging (training-pipeline outlier removal /
    // sensor-anomaly shape): per-user mean/std of `value` from exact
    // decimal power sums (order-independent, engine-agnostic — see detSum),
    // then every event flagged by |value − μ| > 2σ. No division by σ, so a
    // zero-variance user flags nothing instead of dividing by zero; the
    // variance is clamped at 0 before sqrt (the decimal moments make the
    // tiny-negative float case unreachable, but the clamp keeps both
    // engines off sqrt(<0), where IEEE NaN vs SQL NULL would diverge).
    // Scale shape: one partial/final agg keyed by user + one shuffle join
    // back on the same key — stats are |users| rows, events never collect.
    "q_outlier_zscore" -> Q(
      (s, dir) => {
        import s.implicits._
        import graft.functions.GraftFunctions.detSum
        val ev = tbl(s, dir, "events")
        val n = count($"value").cast("double")
        val s1 = detSum($"value", 6)
        val s2 = sum(($"value" * $"value").cast(
          org.apache.spark.sql.types.DecimalType(38, 6))).cast("double")
        val stats = ev.groupBy($"user_id")
          .agg(n.as("n"), s1.as("s1"), s2.as("s2"))
          .filter($"n" >= 2)
          .select($"user_id", ($"s1" / $"n").as("mu"),
            sqrt(greatest(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - lit(1.0)),
              lit(0.0))).as("sd"))
        ev.join(stats, "user_id")
          .select($"event_id", $"user_id", $"value",
            (abs($"value" - $"mu") > lit(2.0) * $"sd").as("is_outlier"))
          .orderBy($"event_id")
      },
      Some("""WITH st AS (
             |  SELECT user_id,
             |    CAST(COUNT(value) AS DOUBLE) AS n,
             |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(value*value AS DECIMAL(38,6))) AS DOUBLE) AS s2
             |  FROM events GROUP BY user_id
             |  HAVING CAST(COUNT(value) AS DOUBLE) >= 2)
             |SELECT e.event_id, e.user_id, e.value,
             |  abs(e.value - s1 / n) >
             |    2.0 * sqrt(greatest((s2 - s1*s1/n) / (n - 1.0), 0.0))
             |    AS is_outlier
             |FROM events e JOIN st USING (user_id)
             |ORDER BY e.event_id""".stripMargin)),

    // Beyond-parity CUBE (all 2^k grouping sets — the OLAP dashboard
    // materialization q_rollup's hierarchy is a subset of). Spark plans one
    // Expand (4 replicas per row) + one hash aggregate: a single shuffle
    // regardless of how many grouping sets, which is why CUBE beats 4
    // separate GROUP BYs at 100 TB (one fact-table pass, not four).
    "q_cube" -> Q(
      (s, dir) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(detSum($"o_totalprice").as("sum_price"), count(lit(1)).as("cnt"))
          .orderBy($"o_orderstatus".asc_nulls_first,
            $"o_orderpriority".asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price,
             |  COUNT(*) AS cnt
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // Beyond-parity equi-width histogram (data profiling / quality-report
    // primitive): literal [0, 60000) domain in 12 bins of 5000, outliers
    // clamped into the edge bins. floor(x / width) is one IEEE divide both
    // engines evaluate identically; a single partial/final hash aggregate,
    // |bins| rows out — the profile-100-TB-in-one-pass shape. Empty bins
    // are absent by construction (deterministic both sides).
    "q_histogram" -> Q(
      (s, dir) => {
        import s.implicits._
        val bin = least(greatest(floor($"l_extendedprice" / lit(5000.0)),
          lit(0.0)), lit(11.0)).cast("long")
        tbl(s, dir, "lineitem")
          .groupBy(bin.as("bin"))
          .agg(count(lit(1)).as("n"),
            detSum($"l_extendedprice").as("sum_price"))
          .select($"bin", ($"bin" * lit(5000.0)).as("lo_edge"), $"n",
            $"sum_price")
          .orderBy($"bin")
      },
      Some("""SELECT bin, CAST(bin * 5000.0 AS DOUBLE) AS lo_edge, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
             |    AS sum_price
             |FROM (SELECT
             |        CAST(least(greatest(floor(l_extendedprice / 5000.0),
             |                            0.0), 11.0) AS BIGINT) AS bin,
             |        l_extendedprice
             |      FROM lineitem)
             |GROUP BY bin ORDER BY bin""".stripMargin)),

    // Beyond-parity correlation/covariance (pandas .corr()/.cov() parity,
    // the feature-analysis reduction): per-group Pearson r and sample
    // covariance of (quantity, price). Spark's built-in corr/covar_samp
    // stream doubles in partition order (run-to-run nondeterministic in the
    // last ulp) — this is the cluster-stable spelling: both engines
    // evaluate the identical IEEE formula over EXACT power sums.
    //
    // Exactness nuance beyond q_stats, measured the hard way: (a) squaring
    // in double and casting the product to DECIMAL(38,6) breaks — price² ≈
    // 1e10 has double-ulp ≈ 2e-6, and DuckDB's double→decimal conversion
    // scales in double space, disagreeing with exact half-up rounding on
    // ~6% of such products; (b) even pure-decimal sums break at the final
    // double cast — a DECIMAL(38,4) sum ≈ 7e12 stores a scaled integer
    // > 2^53, which DuckDB converts int→double→÷10⁴ (two roundings) while
    // the JVM rounds the exact value once. Both round-trips die; integers
    // don't: work in CENTS (exact BIGINT per row since the columns carry
    // ≤ 2 decimals), sum as DECIMAL(38,0) (scale-0 → double is ONE
    // correctly-rounded conversion in both engines), and evaluate the
    // formula on the scaled sums — Pearson r is scale-invariant, and the
    // covariance unscales by one exact-power-of-ten division at the end.
    "q_corr" -> Q(
      (s, dir) => {
        import s.implicits._
        val xi = round($"l_quantity" * 100).cast("long")
        val yi = round($"l_extendedprice" * 100).cast("long")
        def isum(c: org.apache.spark.sql.Column) =
          sum(c.cast(DecimalType(38, 0))).cast("double")
        tbl(s, dir, "lineitem")
          .select($"l_returnflag", xi.as("xi"), yi.as("yi"))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).cast("double").as("n"),
            isum($"xi").as("sx"), isum($"yi").as("sy"),
            isum($"xi" * $"xi").as("sxx"), isum($"yi" * $"yi").as("syy"),
            isum($"xi" * $"yi").as("sxy"))
          .select($"l_returnflag",
            (($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - lit(1.0)) / lit(1.0e4))
              .as("cov_samp"),
            (($"sxy" - $"sx" * $"sy" / $"n") /
              (sqrt($"sxx" - $"sx" * $"sx" / $"n") *
                sqrt($"syy" - $"sy" * $"sy" / $"n"))).as("corr"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  (sxy - sx*sy/n) / (n - 1.0) / 1e4 AS cov_samp,
             |  (sxy - sx*sy/n)
             |    / (sqrt(sxx - sx*sx/n) * sqrt(syy - sy*sy/n)) AS corr
             |FROM (
             |  SELECT l_returnflag,
             |    CAST(COUNT(*) AS DOUBLE) AS n,
             |    CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(yi AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(xi*xi AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(yi*yi AS DECIMAL(38,0))) AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(xi*yi AS DECIMAL(38,0))) AS DOUBLE) AS sxy
             |  FROM (SELECT l_returnflag,
             |          CAST(round(l_quantity * 100) AS BIGINT) AS xi,
             |          CAST(round(l_extendedprice * 100) AS BIGINT) AS yi
             |        FROM lineitem)
             |  GROUP BY l_returnflag)
             |ORDER BY l_returnflag""".stripMargin)),

    // Beyond-parity EQUI-DEPTH histogram (exact quantile buckets — the
    // profiling complement of q_histogram's fixed-width bins): bucket i
    // holds rows with global sort position in [i·n/k, (i+1)·n/k). Exact
    // global positions come from the sampled-splits machinery
    // (Positional.withGlobalPos) — per-bucket windows over driver-pinned
    // split points, never a single-partition ORDER BY window — so this is
    // the 100 TB-safe spelling of ntile-over-everything; the oracle IS
    // ntile-style (DuckDB referees single-node). The bucket index is pure
    // 64-bit integer division (pos·k div n) — no float boundary to disagree
    // on. Ties across all three sort columns would make pos assignment
    // arbitrary, but fully-tied rows are interchangeable in every output
    // stat, so the result is still deterministic. The row count n is one
    // bounded driver long (same class as the split-point collect inside).
    "q_equidepth" -> Q(
      (s, dir) => {
        import s.implicits._
        val li = tbl(s, dir, "lineitem")
          .select($"l_extendedprice", $"l_orderkey", $"l_linenumber")
        val n = li.count()
        graft.operators.Positional.withGlobalPos(li,
            Seq($"l_extendedprice", $"l_orderkey", $"l_linenumber"), "pos")
          .select(expr(s"pos * 8 div $n").as("bucket"), $"l_extendedprice")
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_rows"),
            min($"l_extendedprice").as("lo"),
            max($"l_extendedprice").as("hi"))
          .orderBy($"bucket")
      },
      Some("""WITH p AS (
             |  SELECT l_extendedprice,
             |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
             |                       l_linenumber) - 1 AS pos,
             |    count(*) OVER () AS n
             |  FROM lineitem)
             |SELECT (pos * 8) // n AS bucket, count(*) AS n_rows,
             |       min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
             |FROM p GROUP BY bucket ORDER BY bucket""".stripMargin))
  )
}
