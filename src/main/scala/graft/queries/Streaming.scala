package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Stream/batch parity gates (SURVEY.md §2.10, beyond-parity — the
  * reference has no streaming). The streaming surface is driven through the
  * REAL production entry (file-source micro-batches over the events
  * parquet), drained with an AvailableNow trigger, and the finite result is
  * value-compared against the same aggregation computed by the DuckDB
  * oracle — so the streaming operators are held to the same hash-equality
  * bar as every batch operator, not just spec assertions.
  *
  * Determinism note: the windowed VALUE sum goes through DECIMAL (exact,
  * association-independent) — a double sum's value would depend on
  * micro-batch arrival order, which no cross-engine compare can pin.
  */
object Streaming {

  /** The parquet file source streams a DIRECTORY of arriving files; the
    * testdata ships one flat events.parquet per sf. Stage it into a
    * scratch directory (idempotent, keyed by sf dir) — exactly the
    * production layout, where each arriving file is one micro-batch. */
  private def stageEventsDir(dir: String): String = {
    val stage = java.nio.file.Paths.get(
      "/tmp/graft_stream_stage", dir.replaceAll("[^A-Za-z0-9.]", "_"))
    java.nio.file.Files.createDirectories(stage)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "events.parquet"),
      stage.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    stage.toString
  }

  val defs: Map[String, Q] = Map(
    "q_stream_window_parity" -> Q(
      (s, dir) => {
        val stream = Streams.eventStream(s, stageEventsDir(dir))
          .withColumn("value", col("value").cast("decimal(38,6)"))
        val agg = Streams.windowedCounts(stream,
          width = "1 hour", slide = "1 hour", maxDelay = "1 hour")
        Streams.runToTable(agg, "stream_window_parity")
          .select(col("w_start"), col("w_end"), col("event_type"), col("n"),
            col("total_value").cast("double").as("total_value"))
          .orderBy(col("w_start"), col("event_type"))
      },
      Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start,
             |  time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS w_end,
             |  event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
             |FROM events
             |GROUP BY 1, 2, 3
             |ORDER BY w_start, event_type""".stripMargin)),

    // Streaming SESSION windows vs the oracle's gap-session SQL. Boundary
    // semantics pinned exactly: Spark's session window is [start, last+gap)
    // — end-EXCLUSIVE — so an event arriving at exactly `gap` after the
    // previous one starts a NEW session (windows [t1,t1+g) and [t2,t2+g)
    // merge iff t2 < t1+g). The oracle therefore flags `diff >= gap`, NOT
    // the `diff > gap` of the batch Sessionize operator's oracle.
    "q_stream_session_parity" -> Q(
      (s, dir) => {
        val stream = Streams.eventStream(s, stageEventsDir(dir))
          .withColumn("value", col("value").cast("decimal(38,6)"))
        val agg = Streams.sessionize(stream, gap = "30 minutes",
          maxDelay = "1 hour")
        Streams.runToTable(agg, "stream_session_parity")
          .select(col("user_id"), col("s_start"), col("s_end"),
            col("n_events"),
            col("session_value").cast("double").as("session_value"))
          .orderBy(col("user_id"), col("s_start"))
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS nw
             |  FROM events),
             |sessions AS (
             |  SELECT user_id, ts, value,
             |    SUM(nw) OVER (PARTITION BY user_id ORDER BY ts
             |         ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM flagged)
             |SELECT user_id, MIN(ts) AS s_start,
             |  MAX(ts) + INTERVAL 30 MINUTE AS s_end,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             |    AS session_value
             |FROM sessions GROUP BY user_id, sid
             |ORDER BY user_id, s_start""".stripMargin)),

    // Streaming exact dedup (dropDuplicatesWithinWatermark) vs batch
    // DISTINCT: the emitted KEY SET must match exactly. Only the key
    // columns are compared — which duplicate arrives first is an
    // arrival-order artifact no cross-engine compare can pin, but the set
    // of distinct keys is deterministic.
    "q_stream_dedup_parity" -> Q(
      (s, dir) => {
        val stream = Streams.eventStream(s, stageEventsDir(dir))
        val dd = Streams.dedupStream(
          stream.select(col("ts"), col("user_id"), col("event_type")),
          maxDelay = "1 hour", keys = Seq("user_id", "event_type"))
        Streams.runToTableAppend(dd, "stream_dedup_parity")
          .select(col("user_id"), col("event_type"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin))
  )
}
