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
             |ORDER BY cohort, offset_w""".stripMargin))
  )
}
