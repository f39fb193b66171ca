package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-interval time-series resampling — the batch analog of pandas
  * `resample().agg()` + `ffill()` (the dominant idiom on fletcher-backed
  * time-series frames; fletcher itself delegates it to pandas over its
  * arrays, reference fletcher/base.py pandas-fallback surface). Buckets
  * every event into `[k·step, (k+1)·step)`, aggregates per (key, bucket),
  * densifies to the key's full bucket range (gap buckets appear with
  * count 0), and forward-fills the aggregate across gaps.
  *
  * Scale shape: one partial/final aggregate keyed by (key, bucket); the
  * dense grid comes from a `sequence` GENERATOR over each key's [min, max]
  * bucket span (rows are produced executor-side, span/step per key — never
  * a driver loop); the grid↔agg join and the ffill window both hash by the
  * same key, and the forward-fill is a `last(ignoreNulls)` over an
  * unbounded-preceding frame — Spark evaluates it in one pass per
  * partition, no per-row rescan. Nothing collects.
  *
  * Determinism: the bucket mean is detSum/cnt (decimal partial sums, so
  * partition merge order never perturbs the double); buckets are unique per
  * key, so the ffill window order is total.
  */
object Resample {

  /** Resample `valueCol` per `keyCol` into `stepNs` buckets of the
    * nanos-since-epoch `tsCol`. Output: (key, bucket_ns, n_events, v_mean
    * [null until the first occupied bucket], v_ffill). */
  def resample(df: DataFrame, keyCol: String, tsCol: String, stepNs: Long,
      valueCol: String): DataFrame = {
    val step = lit(stepNs)
    // Exact 64-bit bucket floor (ts − ts % step): ts is ~2^60 ns, beyond
    // double's 2^53 exact-integer range, so a float divide could misbucket
    // a boundary-adjacent event relative to the oracle's integer division.
    // Persisted via the bounded OpCaches registry (r19/r20): b feeds both
    // the grid derivation (per-key min/max) and the left join back onto
    // the grid — unpersisted, the bucket aggregation over the raw events
    // ran twice per action (guide §5; the bucket table is one row per
    // occupied (key, bucket), a bounded downsample of the input). The
    // registry LRU-bounds the frame's lifetime.
    val b = OpCaches.cached(df
      .groupBy(col(keyCol),
        (col(tsCol) - (col(tsCol) % step)).as("bucket_ns"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(38, 6))).cast("double").as("s"))
      .withColumn("v_mean", col("s") / col("n_events")).drop("s"))
    val grid = b.groupBy(col(keyCol))
      .agg(min(col("bucket_ns")).as("lo"), max(col("bucket_ns")).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), step)).as("bucket_ns"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ns"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b, Seq(keyCol, "bucket_ns"), "left")
      .select(col(keyCol), col("bucket_ns"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("v_mean"),
        last(col("v_mean"), ignoreNulls = true).over(w).as("v_ffill"))
  }

  /** [[resample]] plus `v_interp`: gap buckets linearly interpolated between
    * the surrounding occupied buckets (pandas `interpolate(method="linear")`
    * on the resampled frame). Every gap is interior by construction — the
    * grid spans exactly [min, max] OCCUPIED buckets per key — so both
    * neighbors always exist and no edge-extrapolation policy is needed.
    *
    * The forward scan is spelled as a RUNNING frame over the DESCENDING
    * bucket order — `last(ignoreNulls)` over [unbounded preceding, current]
    * — NOT as `first(ignoreNulls)` over [current, unbounded following]:
    * the two are value-identical, but Spark evaluates running frames with
    * an O(n) sliding accumulator while an unbounded-FOLLOWING frame
    * re-aggregates the whole partition tail per row — O(span²) per key,
    * measured 14.4 s vs 0.9 s for the plain resample at the sf0.1 gate and
    * a scale-killer at real span lengths. Cost of the spelling: one extra
    * in-partition Sort on the shared Exchange. The interpolation weight
    * divides bucket deltas cast to double — deltas are small multiples of
    * `stepNs` (< 2^53), so the cast is exact and engine-identical. */
  def resampleInterp(df: DataFrame, keyCol: String, tsCol: String,
      stepNs: Long, valueCol: String): DataFrame = {
    val back = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ns"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwdDesc = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ns").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val occupiedBucket = when(col("v_mean").isNotNull, col("bucket_ns"))
    resample(df, keyCol, tsCol, stepNs, valueCol)
      .withColumn("__b_prev", last(occupiedBucket, ignoreNulls = true).over(back))
      .withColumn("__b_next", last(occupiedBucket, ignoreNulls = true).over(fwdDesc))
      .withColumn("__v_next", last(col("v_mean"), ignoreNulls = true).over(fwdDesc))
      .withColumn("v_interp",
        when(col("v_mean").isNotNull, col("v_mean"))
          .otherwise(col("v_ffill") + (col("__v_next") - col("v_ffill")) *
            ((col("bucket_ns") - col("__b_prev")).cast("double") /
              (col("__b_next") - col("__b_prev")).cast("double"))))
      .drop("__b_prev", "__b_next", "__v_next")
  }
}
