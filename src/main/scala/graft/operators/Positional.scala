package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe positional operators (take-by-position, factorize).
  *
  * The naive Spark spelling of "global row number" —
  * `row_number().over(Window.orderBy(key))` — funnels the ENTIRE table
  * through one partition: a scale-killer at 100 TB. The subtle alternative —
  * range-partition, then join per-partition counts back — is WRONG under
  * re-evaluation: each `Exchange rangepartitioning` instance samples its own
  * boundaries, and Spark does not always reuse the exchange between the
  * rows branch and the counts branch, so the two branches can disagree by a
  * row at partition edges (observed in practice).
  *
  * This implementation therefore goes through ONE sorted RDD and
  * `zipWithIndex`: the RangePartitioner is constructed once for the single
  * RDD DAG, zipWithIndex's count job and data job share the same shuffle
  * files and boundaries, and both the sort and the indexing are fully
  * parallel (the classic deterministic zipWithIndex decomposition).
  *
  * Reference semantics: fletcher take/gather (base.py:1215-1270) and
  * factorize (base.py:961-983).
  */
object Positional {

  /** Attach 0-based global position `posCol` under the total order given by
    * `sortCols` (must be a key — ties across partition boundaries would make
    * positions nondeterministic). Plan is parallel end-to-end: range
    * shuffle + per-partition scan; no single-partition stage. */
  def withGlobalPos(df: DataFrame, sortCols: Seq[Column],
      posCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(posCol, LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rows, schema)
  }

  /** Positional take (gather): rows at the given 0-based positions under the
    * `sortCols` total order, with their positions. Only the matching rows
    * survive; everything stays parallel. */
  def takePositions(df: DataFrame, sortCols: Seq[Column],
      positions: Seq[Long], posCol: String = "pos"): DataFrame =
    withGlobalPos(df, sortCols, posCol)
      .filter(col(posCol).isin(positions: _*))

  /** Dictionary-encode `valueCol`: stable dense codes 0..n-1 assigned in
    * value sort order on the (small) distinct side, broadcast-joined back to
    * the full table — the scale-correct factorize (the dictionary is tiny;
    * the big table never funnels through one partition). Null values keep
    * their rows and get code -1, matching pandas factorize's na_sentinel
    * (reference base.py:961-983). */
  def factorize(df: DataFrame, valueCol: String,
      codeCol: String = "code"): DataFrame = {
    val dict = withGlobalPos(
      df.select(col(valueCol)).filter(col(valueCol).isNotNull).distinct(),
      Seq(col(valueCol)), codeCol)
      .withColumn(codeCol, col(codeCol).cast("int"))
    df.join(broadcast(dict), Seq(valueCol), "left")
      .withColumn(codeCol, coalesce(col(codeCol), lit(-1)))
  }
}
