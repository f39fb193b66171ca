package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-shot data-quality profiling (the deequ/pandas-`describe` reduction a
  * training-data pipeline runs before trusting a new corpus drop): per
  * column — row count, null count, exact distinct count, min and max.
  *
  * Plan shape: one per-column aggregate, unioned. Each branch's scan is
  * parquet-pruned to exactly its own column (a single wide aggregate with
  * k `count(distinct …)`s would instead plan ONE Expand that replicates
  * every row k times — k× the shuffle volume of the whole table). The
  * per-branch exact distinct is itself two-stage (partial distinct per
  * partition, then merge), so nothing funnels unreduced rows.
  *
  * min/max/distinct surface as STRING (binary UTF8 ordering, identical in
  * Spark and DuckDB; integer→string rendering is locale-free) so one
  * uniform schema covers heterogeneous columns. At 100 TB swap the exact
  * distinct for `approx_count_distinct` (HLL) per column — same plan
  * shape, sketch-sized state — which [[profile]] exposes via `exact`. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame =
    cols.map { c =>
      val nd =
        if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      df.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        nd.as("n_distinct"),
        min(col(c)).cast("string").as("min_v"),
        max(col(c)).cast("string").as("max_v"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _)
}
