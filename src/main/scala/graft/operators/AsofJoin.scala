package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-key temporal) join — pandas `merge_asof` / DuckDB
  * `ASOF JOIN` semantics: for every left row, attach the right row with the
  * same key whose time is the greatest ≤ the left time (backward; inclusive)
  * or the least ≥ it (forward), optionally within a tolerance.
  *
  * Spark has no native as-of join, and the naive spellings both fail at
  * 100 TB: a range-condition join explodes to the full per-key cross
  * product before filtering, and a per-left-row subquery is quadratic. This
  * implementation uses the scale-safe UNION + WINDOW decomposition:
  *
  *   1. tag both sides and union them (right payload columns nulled on the
  *      left side and vice versa — no data movement yet);
  *   2. ONE hash shuffle by key, sort within partitions by (time, side)
  *      with right rows ordered before left rows at equal times (backward
  *      inclusivity);
  *   3. `last(payload, ignoreNulls)` over ROWS UNBOUNDED PRECEDING..CURRENT
  *      carries each right row forward to exactly the left rows it is the
  *      most recent match for;
  *   4. keep left rows; apply the tolerance by nulling matches whose time
  *      gap exceeds it.
  *
  * Total cost: one shuffle of |L|+|R| rows, no row multiplication — the
  * same shape as a groupBy at the same key cardinality. A single hot key
  * serializes through one reducer (inherent to per-key ordered semantics;
  * salting cannot cross a running-window boundary) — pre-filter or bucket
  * pathological keys upstream.
  *
  * Determinism requires (keys, rightTime) to be unique on the right side —
  * the same precondition pandas `merge_asof` has for a stable answer.
  */
object AsofJoin {

  /** @param keys        equality key column names (same names both sides)
    * @param leftTime    left ordering column (numeric or timestamp)
    * @param rightTime   right ordering column (same type as leftTime)
    * @param rightPayload right columns to attach; emitted as
    *                    `prefix + name`, plus the matched right time as
    *                    `prefix + rightTime`
    * @param direction   "backward" (greatest right time ≤ left, inclusive)
    *                    or "forward" (least right time ≥ left, inclusive)
    * @param tolerance   max |leftTime − rightTime| in the time column's
    *                    units; matches beyond it become NULL (left row kept)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      direction: String = "backward", tolerance: Option[Long] = None,
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equality key")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    val payloadTypes = rightPayload.map(p => p -> right.schema(p).dataType)
    val rtType = right.schema(rightTime).dataType

    // Union layout: every left column + prefixed right payload + the right
    // time (for tolerance) + order/side markers. Missing columns are typed
    // nulls, so the union is exact and nothing is shuffled twice.
    val lSide = left
      .withColumns(payloadTypes.map { case (p, t) =>
        prefix + p -> lit(null).cast(t) }.toMap)
      .withColumn(prefix + rightTime, lit(null).cast(rtType))
      .withColumn("__ord", col(leftTime))
      .withColumn("__side", lit(1))
    val rSide = right.select(
      leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
      payloadTypes.map { case (p, _) => col(p).as(prefix + p) } ++
      Seq(col(rightTime).as(prefix + rightTime),
        col(rightTime).as("__ord"), lit(0).as("__side")): _*)

    val backward = direction == "backward"
    val ord = if (backward) col("__ord").asc_nulls_first
              else col("__ord").desc_nulls_last
    // Right rows sort before left rows at equal times → equality matches
    // are visible (inclusive), in both directions.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filledNames =
      (rightPayload.map(prefix + _) :+ (prefix + rightTime))
    val unioned = lSide.unionByName(rSide)
    val filled = filledNames.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    val matchedT = col(prefix + rightTime)
    // A NULL left time matches nothing (pandas merge_asof rejects NaT
    // outright; we keep the row, unmatched). Without this, the forward
    // direction's desc_nulls_last order would hand null-time rows the
    // window's final running value as a spurious match.
    val validLeft = col(leftTime).isNotNull
    val gapOk: Column = tolerance match {
      case None => validLeft
      case Some(tol) =>
        val gap = if (backward) col(leftTime) - matchedT
                  else matchedT - col(leftTime)
        validLeft && gap <= lit(tol)
    }
    val toleranced = filledNames.foldLeft(filled)((df, c) =>
      df.withColumn(c, when(gapOk, col(c))))
    toleranced.filter(col("__side") === 1).drop("__ord", "__side")
  }
}
