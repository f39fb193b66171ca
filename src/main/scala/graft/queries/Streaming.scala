package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.TextOps._
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
    * testdata ships one flat <table>.parquet per sf. Stage it into a
    * scratch directory (idempotent, keyed by sf dir + table) — exactly the
    * production layout, where each arriving file is one micro-batch. */
  private def stageDir(dir: String, file: String): String = {
    val stage = java.nio.file.Paths.get(
      "/tmp/graft_stream_stage",
      (dir + "/" + file).replaceAll("[^A-Za-z0-9.]", "_"))
    java.nio.file.Files.createDirectories(stage)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, file),
      stage.resolve(file),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    stage.toString
  }
  private def stageEventsDir(dir: String): String =
    stageDir(dir, "events.parquet")

  val defs: Map[String, Q] = Map(
    // Streaming corpus QUALITY filtering: the stateless quality/lang
    // projection (tokens, stopword ratio, language argmax, keep verdict)
    // applied to documents as they land, drained AvailableNow and
    // hash-compared to the oracle computing the same flags in batch —
    // proving the text-analysis expression surface runs unchanged under
    // micro-batch execution (no state, so parity must be exact).
    "q_stream_quality_parity" -> Q(
      (s, dir) => {
        val stream = Streams.documentStream(s,
          stageDir(dir, "documents.parquet"))
        val toks = tokens(col("text"))
        val nTok = size(toks)
        val stopR = stopHits(toks, StopEn).cast("double") /
          nTok.cast("double")
        val flags = stream.select(
          col("doc_id"),
          nTok.as("n_tokens"),
          stopR.as("stop_ratio"),
          langPredict(toks).as("lang_pred"),
          (nTok >= 10 && nTok <= 1000 && stopR >= 0.01).as("keep"))
        Streams.runToTableAppend(flags, "stream_quality_parity")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              |scored AS (
              |  SELECT doc_id, w, ${LangOrder.map { case (l, set) =>
                   s"${DuckFrag.stopHitsSql(set)} AS s_$l" }.mkString(", ")}
              |  FROM toks)
              |SELECT doc_id, len(w) AS n_tokens,
              |       CAST(${DuckFrag.stopHitsSql(StopEn)} AS DOUBLE) /
              |         CAST(len(w) AS DOUBLE) AS stop_ratio,
              |       ${DuckFrag.langPredictSql} AS lang_pred,
              |       (len(w) >= 10 AND len(w) <= 1000 AND
              |        CAST(${DuckFrag.stopHitsSql(StopEn)} AS DOUBLE) /
              |          CAST(len(w) AS DOUBLE) >= 0.01) AS keep
              |FROM scored ORDER BY doc_id""".stripMargin)),

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
