package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (nearest-key temporal) join — pandas `merge_asof` / DuckDB
  * `ASOF JOIN` semantics: for every left row, attach the right row with the
  * same key whose time is the greatest ≤ the left time (backward), the
  * least ≥ it (forward), or whichever of those two is closer (nearest;
  * backward wins ties), optionally within a tolerance and optionally
  * excluding exact-time matches (`allowExactMatches = false`) — the full
  * pandas `merge_asof` parameter surface.
  *
  * Spark has no native as-of join, and the naive spellings both fail at
  * 100 TB: a range-condition join explodes to the full per-key cross
  * product before filtering, and a per-left-row subquery is quadratic. This
  * implementation uses the scale-safe UNION + WINDOW decomposition:
  *
  *   1. tag both sides and union them — each right row carries its time +
  *      payload packed into ONE struct column, null on left rows (no data
  *      movement yet). The single struct is what makes a match ATOMIC: a
  *      legitimately-NULL payload field stays inside the matched row's
  *      non-null struct instead of back-filling from an older right row;
  *   2. ONE hash shuffle by key, sort within partitions by (time, side)
  *      with right rows ordered before left rows at equal times (backward
  *      inclusivity);
  *   3. `last(struct, ignoreNulls)` over ROWS UNBOUNDED PRECEDING..CURRENT
  *      carries each right row forward to exactly the left rows it is the
  *      most recent match for; then the struct is unpacked;
  *   4. keep left rows; apply the tolerance by nulling matches whose time
  *      gap exceeds it.
  *
  * Total cost: one shuffle of |L|+|R| rows, no row multiplication — the
  * same shape as a groupBy at the same key cardinality. A single hot key
  * serializes through one reducer (inherent to per-key ordered semantics;
  * salting cannot cross a running-window boundary) — pre-filter or bucket
  * pathological keys upstream.
  *
  * Right rows with a NULL time are dropped before the union — they can
  * never be a valid match (DuckDB ASOF and pandas `merge_asof` both
  * exclude/reject null ordering keys).
  *
  * Duplicate (keys, rightTime) right rows are resolved DETERMINISTICALLY:
  * the sort tie-breaks on the packed (payload..., time) struct itself, so
  * the row with the greatest payload tuple (field-wise, nulls first) wins —
  * stable across runs, partitionings, and engines. pandas `merge_asof`
  * instead requires uniqueness; callers wanting that strictness can assert
  * it upstream, but a silent nondeterministic winner is never possible here.
  */
object AsofJoin {

  /** @param keys        equality key column names (same names both sides)
    * @param leftTime    left ordering column (numeric or timestamp; for
    *                    direction=nearest it must be numeric, so gaps
    *                    subtract)
    * @param rightTime   right ordering column (same type as leftTime)
    * @param rightPayload right columns to attach; emitted as
    *                    `prefix + name`, plus the matched right time as
    *                    `prefix + rightTime`
    * @param direction   "backward" (greatest right time ≤ left),
    *                    "forward" (least right time ≥ left), or "nearest"
    *                    (whichever of the two has the smaller |gap|;
    *                    backward wins ties — pandas merge_asof semantics)
    * @param tolerance   max |leftTime − rightTime| in the time column's
    *                    units; matches beyond it become NULL (left row kept)
    * @param allowExactMatches false excludes right rows at EXACTLY the left
    *                    time (pandas allow_exact_matches=False): backward
    *                    becomes strictly-less-than, forward strictly-greater
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      direction: String = "backward", tolerance: Option[Long] = None,
      prefix: String = "asof_",
      allowExactMatches: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equality key")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns.toSeq

    // Union layout: every left column + ONE packed (payload..., time) struct
    // + order/side markers. The struct is null on left rows and non-null on
    // every right row — even when individual payload FIELDS are null — so
    // the ignoreNulls forward-fill treats a match atomically and can never
    // mix payload values from two different right rows. The time rides
    // inside as "__rt" (a reserved name, so a payload column may itself be
    // the time column).
    val packT = StructType(
      rightPayload.map(p => right.schema(p).copy(name = p)) :+
        right.schema(rightTime).copy(name = "__rt"))
    val pack = struct(
      rightPayload.map(p => col(p).as(p)) :+ col(rightTime).as("__rt"): _*)
    val lSide = left
      .withColumn("__asof_s", lit(null).cast(packT))
      .withColumn("__ord", col(leftTime))
      .withColumn("__side", lit(1))
    val rSide = right
      .filter(col(rightTime).isNotNull) // null time rows can never match
      .select(
        leftCols.map(c =>
          if (keys.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(pack.as("__asof_s"),
          col(rightTime).as("__ord"), lit(0).as("__side")): _*)

    // Running fill for one direction. Right rows sort BEFORE left rows at
    // equal times when exact matches are allowed (side asc: 0 < 1), AFTER
    // them when excluded (side desc) — so the running last() at a left row
    // either sees or skips the same-time right row. The struct tie-break
    // orders duplicate (keys, rightTime) right rows deterministically:
    // last() picks the greatest (payload..., time) tuple.
    def fill(backward: Boolean): Column = {
      val ord = if (backward) col("__ord").asc_nulls_first
                else col("__ord").desc_nulls_last
      val side = if (allowExactMatches) col("__side").asc
                 else col("__side").desc
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(ord, side, col("__asof_s").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__asof_s"), ignoreNulls = true).over(w)
    }

    // A NULL left time matches nothing (pandas merge_asof rejects NaT
    // outright; we keep the row, unmatched). Without this, the forward
    // direction's desc_nulls_last order would hand null-time rows the
    // window's final running value as a spurious match.
    val validLeft = col(leftTime).isNotNull
    // Gate one direction's candidate struct by validity + tolerance.
    // (Exact-match exclusion needs no gate: the side sort order above
    // already hides same-time right rows from the running fill.)
    def gated(s: Column, backward: Boolean): Column = {
      val gap = if (backward) col(leftTime) - s.getField("__rt")
                else s.getField("__rt") - col(leftTime)
      val ok = tolerance.foldLeft(validLeft)((c, tol) => c && gap <= lit(tol))
      when(ok, s)
    }

    val unioned = lSide.unionByName(rSide)
    val filled = direction match {
      case "nearest" =>
        // both running fills share the one hash shuffle (same partitioning;
        // two sorts); the smaller-gap candidate wins, backward on ties —
        // pandas merge_asof nearest semantics
        val b = gated(fill(backward = true), backward = true)
        val f = gated(fill(backward = false), backward = false)
        val bGap = col(leftTime) - col("__b").getField("__rt")
        val fGap = col("__f").getField("__rt") - col(leftTime)
        unioned
          .withColumn("__b", b).withColumn("__f", f)
          .withColumn("__asof_s",
            when(col("__f").isNull, col("__b"))
              .when(col("__b").isNull, col("__f"))
              .when(bGap <= fGap, col("__b")).otherwise(col("__f")))
          .drop("__b", "__f")
      case d =>
        unioned.withColumn("__asof_s",
          gated(fill(backward = d == "backward"), backward = d == "backward"))
    }

    // Unpack the surviving struct — field nulls inside it are the matched
    // row's own nulls, by construction.
    filled
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(p =>
          col("__asof_s").getField(p).as(prefix + p)) :+
        col("__asof_s").getField("__rt").as(prefix + rightTime): _*)
  }
}
