package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without the cross-product blowup.
  *
  * Spark plans `p BETWEEN s AND e` (plus an equality key) as a hash join on
  * the key alone, re-filtering the full per-key cross product — quadratic in
  * the hot keys — and with no equality key at all as BroadcastNestedLoop.
  * At 100 TB both are fatal.
  *
  * The scale-safe spelling is BIN BLOCKING: quantize the time axis into
  * fixed-width bins; a point joins only the bin it falls in, an interval is
  * exploded to every bin it overlaps. The equi-join on (key, bin) then sees
  * only candidates that can match, and the exact `BETWEEN` filter runs on
  * that small candidate set. A (point, interval) pair can only meet in the
  * point's single bin, so no dedup pass is needed.
  *
  * Cost model: shuffle volume is |points| + Σ⌈interval span / binWidth⌉ —
  * pick `binWidth` near the TYPICAL interval length so most intervals
  * explode to 1-2 bins. Skewed keys shard across bins by construction
  * (time spreads a hot key over many (key, bin) groups), which is exactly
  * what the plain per-key hash join lacks.
  */
object RangeJoin {

  /** Join each point row to every interval row with equal `keys` and
    * `startCol <= pointCol <= endCol` (inclusive both ends — SQL BETWEEN
    * parity). Time columns must be integral (epoch ticks). Interval columns
    * are emitted with `prefix`. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, startCol: String, endCol: String,
      binWidth: Long, prefix: String = "iv_"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val ivPayload = intervals.columns.filterNot(keys.contains)
    val iv = intervals.select(
        keys.map(col) ++ ivPayload.map(c => col(c).as(prefix + c)): _*)
      // empty intervals (end < start) match nothing under BETWEEN; drop
      // them BEFORE sequence(), which would throw on a descending range
      .filter(col(prefix + endCol) >= col(prefix + startCol))
      .withColumn("__bin", explode(sequence(
        floor(col(prefix + startCol) / binWidth),
        floor(col(prefix + endCol) / binWidth))))
    p.join(iv, keys :+ "__bin")
      .filter(col(pointCol) >= col(prefix + startCol) &&
        col(pointCol) <= col(prefix + endCol))
      .drop("__bin")
  }
}
