package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe positional operators (take-by-position, factorize).
  *
  * The naive Spark spelling of "global row number" —
  * `row_number().over(Window.orderBy(key))` — funnels the ENTIRE table
  * through one partition: a scale-killer at 100 TB. This module computes the
  * same global positions with the classic zipWithIndex decomposition, kept
  * fully declarative so it stays inside whole-stage codegen:
  *
  *  1. `repartitionByRange(key)` — partitions hold disjoint, ordered key
  *     ranges (parallel range-partitioned sort, same machinery as orderBy);
  *  2. per-partition `row_number` windows, partitioned by partition id —
  *     parallel across all partitions;
  *  3. per-partition row counts (a tiny aggregate: one row per partition)
  *     turned into cumulative start offsets with a triangular self-join —
  *     O(P²) pairs over P = #partitions rows, i.e. negligible — then
  *     broadcast back. No unpartitioned Window anywhere in the plan.
  *
  * Reference semantics: fletcher take/gather (base.py:1215-1270) and
  * factorize (base.py:961-983).
  */
object Positional {

  /** Attach 0-based global position `posCol` under the total order given by
    * `sortCols` (must be a key — ties across partition boundaries would make
    * positions nondeterministic). Plan is parallel end-to-end.
    */
  def withGlobalPos(df: DataFrame, sortCols: Seq[Column],
      posCol: String): DataFrame = {
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val local = ranged.withColumn("__lrn", row_number().over(wLocal))
    val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    // cumulative offset of partition p = Σ counts of partitions < p
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(posCol, col("__off") + col("__lrn") - 1)
      .drop("__pid", "__lrn", "__off")
  }

  /** Positional take (gather): rows at the given 0-based positions under the
    * `sortCols` total order, with their positions. Only the matching rows
    * survive the broadcast-side filter; everything stays parallel. */
  def takePositions(df: DataFrame, sortCols: Seq[Column],
      positions: Seq[Long], posCol: String = "pos"): DataFrame =
    withGlobalPos(df, sortCols, posCol)
      .filter(col(posCol).isin(positions: _*))

  /** Dictionary-encode `valueCol`: stable dense codes 0..n-1 assigned in
    * value sort order on the (small) distinct side, broadcast-joined back to
    * the full table — the scale-correct factorize (the dictionary is tiny;
    * the big table never funnels through one partition). */
  def factorize(df: DataFrame, valueCol: String,
      codeCol: String = "code"): DataFrame = {
    val dict = withGlobalPos(
      df.select(col(valueCol)).distinct(), Seq(col(valueCol)), codeCol)
      .withColumn(codeCol, col(codeCol).cast("int"))
    df.join(broadcast(dict), valueCol)
  }
}
