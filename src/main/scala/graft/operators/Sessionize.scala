package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — assign every event a per-key session ordinal
  * such that consecutive events more than `gap` apart start a new session
  * (the batch analog of Structured Streaming's session windows, and the
  * standard "user activity session" primitive of event pipelines).
  *
  * ONE shuffle by key + an in-partition sort: session boundaries are a
  * `lag` comparison, session ids a running sum of the boundary flags —
  * both over the same window, so Catalyst plans a single Window operator
  * (one Exchange + one Sort). No iteration, no self-join.
  *
  * Determinism: (keys, tsCol) must be unique per key — equal timestamps
  * would make lag order, and thus boundary placement, nondeterministic. */
object Sessionize {

  /** Adds `sessionCol`: 1-based session ordinal per key group, in time
    * order. `gap` is in the time column's units; a step of exactly `gap`
    * stays in-session (boundary is `> gap`, pandas/Flink convention). */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String, gap: Long,
      sessionCol: String = "session_id"): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    // Two window steps (a window function can't nest inside another's
    // argument), but both share the same partitioning + ordering, so the
    // planner runs them over one Exchange + one Sort.
    // First event of a key: lag is null → comparison null → otherwise(0);
    // the +1 makes the first session id 1.
    df.withColumn("__gr_new",
        when(col(tsCol) - lag(col(tsCol), 1).over(byKey) > gap, 1L)
          .otherwise(lit(0L)))
      .withColumn(sessionCol,
        sum(col("__gr_new")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          + 1L)
      .drop("__gr_new")
  }
}
