package graft.queries

import org.apache.spark.sql.functions._

/** Event-analytics compositions over the events stream table: funnel
  * conversion and cohort retention — the two classic product-analytics
  * reductions, spelled as declarative multi-stage plans (no iteration,
  * no driver loops; every stage keyed by user or by the tiny
  * (cohort, offset) pair).
  */
object EventAnalytics {

  val defs: Map[String, Q] = Map(
    // Funnel: first 'view' per user, then conversion = any 'click' within
    // 24h AFTER it. Stage A is one user-keyed aggregate; the conversion
    // probe joins clicks to the (user, ts_a) table on the same key (AQE
    // broadcasts the step-A side when small) and DISTINCTs converted
    // users — event payloads never fan out. All time math on canonical
    // nanos-longs.
    "q_funnel" -> Q(
      (s, dir) => {
        import s.implicits._
        val dayNs = 86400L * 1000 * 1000 * 1000
        val ev = tbl(s, dir, "events")
          .select($"user_id", $"ts", $"event_type")
        val a = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("ts_a"))
        val conv = ev.filter($"event_type" === "click")
          .join(a, "user_id")
          .where($"ts" > $"ts_a" && $"ts" - $"ts_a" <= dayNs)
          .select($"user_id").distinct()
        a.join(conv.withColumn("c", lit(true)), Seq("user_id"), "left")
          .select($"user_id",
            timestamp_micros(expr("ts_a div 1000")).as("ts_a"),
            coalesce($"c", lit(false)).as("converted"))
          .orderBy($"user_id")
      },
      Some("""WITH a AS (
             |  SELECT user_id, min(ts) AS ts_a FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |c AS (
             |  SELECT DISTINCT e.user_id FROM events e JOIN a USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts > a.ts_a
             |    AND epoch_us(e.ts) - epoch_us(a.ts_a) <= 86400000000)
             |SELECT a.user_id, a.ts_a,
             |       a.user_id IN (SELECT user_id FROM c) AS converted
             |FROM a ORDER BY a.user_id""".stripMargin)),

    // Markov transition matrix over per-user event sequences (clickstream
    // path analysis): consecutive (current → next) event-type pairs from a
    // lead() window PARTITIONED BY USER (parallel — per-user sequences are
    // bounded, so no single-reducer window), then pair counts and
    // P(next|current) = n_pair/n_from as one exact bigint→double division.
    // (user_id, ts, event_id) is a row key, so the sequence order — and
    // therefore every count — is engine-independent.
    "q_transitions" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        val pairs = tbl(s, dir, "events")
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("nxt", lead($"event_type", 1).over(w))
          .filter($"nxt".isNotNull)
        val c = pairs.groupBy($"event_type".as("cur"), $"nxt")
          .agg(count(lit(1)).as("n_pair"))
        val tot = c.groupBy($"cur").agg(sum($"n_pair").as("n_from"))
        c.join(tot, "cur")
          .select($"cur", $"nxt", $"n_pair", $"n_from",
            ($"n_pair" / $"n_from").as("p_next"))
          .orderBy($"cur", $"nxt")
      },
      Some("""WITH p AS (
             |  SELECT event_type AS cur,
             |    lead(event_type) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS nxt
             |  FROM events),
             |c AS (SELECT cur, nxt, count(*) AS n_pair FROM p
             |      WHERE nxt IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT cur, CAST(sum(n_pair) AS BIGINT) AS n_from
             |      FROM c GROUP BY 1)
             |SELECT cur, nxt, n_pair, n_from, n_pair / n_from AS p_next
             |FROM c JOIN t USING (cur) ORDER BY cur, nxt""".stripMargin)),

    // Cohort retention: cohort = a user's first active week; each later
    // active week lands in (cohort, offset). Spelled WITHOUT countDistinct
    // (whose mixed-distinct aggregate plans an Expand): distinct
    // (user, week) pairs reduce to n_users, raw events to n_events, and
    // the two |cohorts|·|weeks|-row results join at the end — three small
    // keyed aggregates, no Expand, no row explosion.
    "q_retention" -> Q(
      (s, dir) => {
        import s.implicits._
        val weekNs = 604800L * 1000 * 1000 * 1000
        val ev = tbl(s, dir, "events")
          .select($"user_id", expr(s"ts div ${weekNs}L").as("week"))
        val wk = ev.distinct()
        val w0 = wk.groupBy($"user_id").agg(min($"week").as("cohort"))
        val users = wk.join(w0, "user_id")
          .groupBy($"cohort", ($"week" - $"cohort").as("offset_w"))
          .agg(count(lit(1)).as("n_users"))
        val eventsCnt = ev.join(w0, "user_id")
          .groupBy($"cohort", ($"week" - $"cohort").as("offset_w"))
          .agg(count(lit(1)).as("n_events"))
        users.join(eventsCnt, Seq("cohort", "offset_w"))
          .orderBy($"cohort", $"offset_w")
      },
      Some("""WITH wk AS (
             |  SELECT DISTINCT user_id,
             |         (epoch_us(ts) * 1000) // 604800000000000 AS week
             |  FROM events),
             |w0 AS (SELECT user_id, min(week) AS cohort FROM wk
             |       GROUP BY user_id),
             |u AS (
             |  SELECT cohort, week - cohort AS offset_w,
             |         count(*) AS n_users
             |  FROM wk JOIN w0 USING (user_id)
             |  GROUP BY cohort, week - cohort),
             |e AS (
             |  SELECT cohort,
             |         (epoch_us(ts) * 1000) // 604800000000000 - cohort
             |           AS offset_w,
             |         count(*) AS n_events
             |  FROM events JOIN w0 USING (user_id)
             |  GROUP BY 1, 2)
             |SELECT cohort, offset_w, n_users, n_events
             |FROM u JOIN e USING (cohort, offset_w)
             |ORDER BY cohort, offset_w""".stripMargin)),

    // SCD2 point-in-time enrichment: the signup change log becomes a
    // validity-interval dimension (Merge.scd2 — one user-keyed lead()
    // window), and purchases join the version valid AT their event time
    // via the bin-blocked RangeJoin (equi-join on (user, 2-day bin) + the
    // exact BETWEEN filter — never a per-key cross product). The horizon
    // capping the open last version is ONE bounded driver long (max event
    // ts), the same class as pageRank's node count. Purchases before a
    // user's first signup version drop (inner point-in-interval join).
    "q_scd2_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val twoDaysNs = 2L * 86400L * 1000 * 1000 * 1000
        val ev = tbl(s, dir, "events")
        // empty input → no facts/versions anyway; any horizon works
        val mm = ev.agg(max($"ts")).head()
        val horizon = if (mm.isNullAt(0)) 0L else mm.getLong(0)
        val dim = graft.operators.Merge.scd2(
            ev.filter($"event_type" === "signup")
              .select($"user_id", $"ts", $"event_id".as("ver_id"),
                $"value".as("plan_value")),
            "user_id", "ts", Seq("ver_id"), horizon)
          .select($"user_id", $"ver_id", $"plan_value",
            $"valid_from", $"valid_to")
        val facts = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        graft.operators.RangeJoin.pointInInterval(facts, dim,
            Seq("user_id"), "ts", "valid_from", "valid_to",
            binWidth = twoDaysNs)
          .select($"event_id", $"user_id",
            timestamp_micros(expr("ts div 1000")).as("fact_time"),
            $"iv_ver_id".as("ver_id"), $"iv_plan_value".as("plan_value"),
            timestamp_micros(expr("iv_valid_from div 1000"))
              .as("valid_from"))
          .orderBy($"event_id")
      },
      Some("""WITH dim AS (
             |  SELECT user_id, ts, event_id AS ver_id,
             |    value AS plan_value, epoch_ns(ts) AS vf,
             |    coalesce(lead(epoch_ns(ts)) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id) - 1,
             |      (SELECT max(epoch_ns(ts)) FROM events)) AS vt
             |  FROM events WHERE event_type = 'signup'),
             |f AS (
             |  SELECT event_id, user_id, ts, epoch_ns(ts) AS tn
             |  FROM events WHERE event_type = 'purchase')
             |SELECT f.event_id, f.user_id, f.ts AS fact_time,
             |  d.ver_id, d.plan_value, d.ts AS valid_from
             |FROM f JOIN dim d
             |  ON f.user_id = d.user_id AND f.tn BETWEEN d.vf AND d.vt
             |ORDER BY f.event_id""".stripMargin)),

    // Last-touch marketing attribution: each purchase attributes to the
    // most recent 'view' within 3 days (the as-of join's tolerance
    // surface), then revenue reduces per touch — purchases beyond any
    // touch's window land in the explicit -1 bucket (not NULL: engines
    // disagree on null sort order). One as-of shuffle + one keyed
    // aggregate; revenue through DECIMAL (order-free, engine-identical).
    "q_attribution" -> Q(
      (s, dir) => {
        import s.implicits._
        val threeDaysNs = 3L * 86400L * 1000 * 1000 * 1000
        val ev = tbl(s, dir, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts", $"value")
        val views = ev.filter($"event_type" === "view")
          .select($"user_id", $"ts", $"event_id".as("touch_id"))
        graft.operators.AsofJoin.asof(purchases, views, Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            rightPayload = Seq("touch_id"),
            tolerance = Some(threeDaysNs))
          .groupBy(coalesce($"asof_touch_id", lit(-1L)).as("touch_id"))
          .agg(count(lit(1)).as("n_purchases"),
            sum($"value".cast("decimal(38,6)")).cast("double")
              .as("revenue"))
          .orderBy($"touch_id")
      },
      Some("""WITH a AS (
             |  SELECT l.event_id, l.value,
             |    CASE WHEN epoch_ns(l.ts) - epoch_ns(r.ts)
             |              <= 259200000000000
             |         THEN r.event_id END AS touch_id
             |  FROM (SELECT * FROM events WHERE event_type = 'purchase') l
             |  ASOF LEFT JOIN
             |       (SELECT * FROM events WHERE event_type = 'view') r
             |    ON l.user_id = r.user_id AND l.ts >= r.ts)
             |SELECT coalesce(touch_id, -1) AS touch_id,
             |  count(*) AS n_purchases,
             |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             |    AS revenue
             |FROM a GROUP BY 1 ORDER BY touch_id""".stripMargin)),

    // Gaps-and-islands: per-user runs of CONSECUTIVE active days (the
    // engagement-streak reduction). day − row_number() is constant within
    // a consecutive run — the classic islands key — and the window is
    // user-partitioned (parallel, bounded state); distinct (user, day)
    // first, so event volume never reaches the window.
    "q_islands" -> Q(
      (s, dir) => {
        import s.implicits._
        val dayNs = 86400L * 1000 * 1000 * 1000
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"day")
        tbl(s, dir, "events")
          .select($"user_id", expr(s"ts div ${dayNs}L").as("day"))
          .distinct()
          .withColumn("grp", $"day" - row_number().over(w))
          .groupBy($"user_id", $"grp")
          .agg(min($"day").as("streak_start"),
            max($"day").as("streak_end"),
            count(lit(1)).as("n_days"))
          .select($"user_id", $"streak_start", $"streak_end", $"n_days")
          .orderBy($"user_id", $"streak_start")
      },
      Some("""WITH d AS (
             |  SELECT DISTINCT user_id,
             |    epoch_ns(ts) // 86400000000000 AS day
             |  FROM events),
             |g AS (
             |  SELECT user_id, day,
             |    day - row_number() OVER (
             |      PARTITION BY user_id ORDER BY day) AS grp
             |  FROM d)
             |SELECT user_id, min(day) AS streak_start,
             |  max(day) AS streak_end, count(*) AS n_days
             |FROM g GROUP BY user_id, grp
             |ORDER BY user_id, streak_start""".stripMargin)),

    // Exponentially-weighted mean (pandas ewm(alpha=.5, adjust=False)
    // parity): per user, the recursion s₁=x₁, sₜ=(sₜ₋₁+xₜ)/2 folded over
    // the (ts, event_id)-ordered value list. The fold is SEQUENTIAL in
    // both engines (Spark `aggregate` seeded with element 1 over the tail;
    // DuckDB `list_reduce`, which seeds with the first element) — same
    // order, each op correctly rounded, division by 2 exact — so the
    // smoothed double is BIT-identical with no rounding step. Per-user
    // lists are bounded (events/user); the aggregate is keyed — for
    // unbounded streams use the resample buckets first.
    "q_ewm" -> Q(
      (s, dir) => {
        import s.implicits._
        val vals = transform(
          array_sort(collect_list(struct($"ts", $"event_id", $"value"))),
          e => e.getField("value"))
        tbl(s, dir, "events")
          .filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"), vals.as("vals"))
          .select($"user_id", $"n_events",
            aggregate(expr("slice(vals, 2, size(vals) - 1)"),
              element_at($"vals", 1),
              (acc, x) => (acc + x) / 2.0).as("ewm"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |  list_reduce(list(value ORDER BY ts, event_id),
             |    (acc, x) -> (acc + x) / 2.0) AS ewm
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Behavioral entropy: Shannon entropy of each user's event-type
    // distribution (the "does this account do one thing or many"
    // feature). Per-user term lists are tiny (≤ |event types|) and folded
    // SEQUENTIALLY in event-type order — a grouped float sum would be
    // partition-order-dependent, a sorted fold is engine-identical (the
    // q_ewm rule); ln is the one transcendental → round-6.
    "q_entropy" -> Q(
      (s, dir) => {
        import s.implicits._
        val byType = tbl(s, dir, "events")
          .groupBy($"user_id", $"event_type")
          .agg(count(lit(1)).as("c"))
        byType.groupBy($"user_id")
          .agg(sum($"c").as("n"),
            array_sort(collect_list(struct($"event_type", $"c")))
              .as("cs"))
          .select($"user_id", $"n",
            round(aggregate($"cs", lit(0.0), (acc, t) => {
              val p = t.getField("c").cast("double") / $"n"
              acc - p * log(p)
            }), 6).as("entropy"))
          .orderBy($"user_id")
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_type, count(*) AS c FROM events
             |  GROUP BY 1, 2),
             |a AS (
             |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
             |         list(c ORDER BY event_type) AS cs
             |  FROM c GROUP BY 1)
             |SELECT user_id, n,
             |  round(list_reduce(list_prepend(0.0,
             |    list_transform(cs, x -> -(x / n) * ln(x / n))),
             |    (acc, y) -> acc + y), 6) AS entropy
             |FROM a ORDER BY user_id""".stripMargin)),

    // Robust per-user anomaly detection: median/MAD outliers on purchase
    // values, spelled EXACTLY in integers — values become cents, medians
    // compute on DOUBLED scales so every interpolated midpoint is an
    // integer (percentile/quantile_cont midpoints of int64 < 2⁵³ are exact
    // in both engines), and the flag |x−med|·20000 > 3·14826·mad4 is pure
    // int64 arithmetic (the 1.4826 normal-consistency constant ×10⁴) — no
    // float enters any decision. Exact per-group percentile holds the
    // group's values (bounded per-user event counts); at 100 TB swap
    // approx_percentile into the same shape. Complements q_outlier_zscore
    // (mean/σ): MAD shrugs off the very outliers a σ threshold dilutes.
    "q_robust_outlier" -> Q(
      (s, dir) => {
        import s.implicits._
        val p = tbl(s, dir, "events")
          .filter($"event_type" === "purchase")
          .select($"event_id", $"user_id",
            round($"value" * 100).cast("long").as("cents"))
        val med = p.groupBy($"user_id")
          .agg(percentile($"cents" * 2, lit(0.5)).cast("long").as("med2"))
        val dev = p.join(med, "user_id")
          .withColumn("adev2", abs($"cents" * 2 - $"med2"))
        val mad = dev.groupBy($"user_id")
          .agg(percentile($"adev2" * 2, lit(0.5)).cast("long").as("mad4"))
        dev.join(mad, "user_id")
          .filter($"adev2" * 20000L > lit(3L) * 14826L * $"mad4")
          .select($"event_id", $"user_id", $"cents", $"med2", $"mad4")
          .orderBy($"event_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |med AS (
             |  SELECT user_id,
             |    CAST(quantile_cont(cents * 2, 0.5) AS BIGINT) AS med2
             |  FROM p GROUP BY user_id),
             |dev AS (
             |  SELECT p.event_id, p.user_id, p.cents, med.med2,
             |    abs(p.cents * 2 - med.med2) AS adev2
             |  FROM p JOIN med USING (user_id)),
             |mad AS (
             |  SELECT user_id,
             |    CAST(quantile_cont(adev2 * 2, 0.5) AS BIGINT) AS mad4
             |  FROM dev GROUP BY user_id)
             |SELECT d.event_id, d.user_id, d.cents, d.med2, m.mad4
             |FROM dev d JOIN mad m USING (user_id)
             |WHERE d.adev2 * 20000 > 3 * 14826 * m.mad4
             |ORDER BY d.event_id""".stripMargin))
  )
}
