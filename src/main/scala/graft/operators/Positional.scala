package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe positional operators (take-by-position, factorize).
  *
  * The naive Spark spelling of "global row number" —
  * `row_number().over(Window.orderBy(key))` — funnels the ENTIRE table
  * through one partition: a scale-killer at 100 TB. The subtle trap in the
  * parallel spelling — range partition, then join per-partition counts
  * back — is that each `Exchange rangepartitioning` instance samples its
  * own boundaries, and Spark does not always reuse the exchange between
  * the rows branch and the counts branch, so the two branches can disagree
  * by a row at partition edges (observed in practice).
  *
  * [[withGlobalPos]] therefore pins the boundaries itself: a deterministic
  * hash-filtered sample of the key column is collected ONCE on the driver
  * and folded into a PURE bucket expression (literal split points). Every
  * pass — per-bucket counts, and the per-bucket `row_number` — evaluates
  * that same pure expression, so no two branches can ever disagree, and the
  * whole plan stays inside whole-stage codegen (no RDD drop-out, no row
  * boxing). Only the final pass moves whole rows; the count/sample/offset
  * passes scan just the key column (parquet-pruned).
  *
  * Reference semantics: fletcher take/gather (base.py:1215-1270) and
  * factorize (base.py:961-983).
  */
object Positional {

  /** Attach 0-based global position `posCol` under the total order given by
    * `sortCols` (must be a key — ties across partition boundaries would make
    * positions nondeterministic). Single sort column takes the codegen
    * sampled-splits path; multi-column falls back to the deterministic
    * sorted-RDD zipWithIndex decomposition. */
  def withGlobalPos(df: DataFrame, sortCols: Seq[Column],
      posCol: String): DataFrame = sortCols match {
    case Seq(key) => sampledSplitPos(df, key, posCol)
    case _ => zipWithIndexPos(df, sortCols, posCol)
  }

  /** Codegen global-position plan for a single key column.
    *
    * 1. [[splitPoints]] → ≤ numShufflePartitions−1 literal split points on
    *    the driver (one key-pruned aggregate job for numeric keys);
    * 2. bucket = Σ [key > splitᵢ] — a pure, order-preserving expression;
    * 3. per-bucket base offsets as a broadcast subquery (aggregate to ≤ n
    *    rows + cumulative sum) — runs inside the final job;
    * 4. pos = offset(bucket) + row_number() over (bucket, key) — the window
    *    shuffles each bucket to one reducer, never the whole table to one.
    */
  private def sampledSplitPos(df: DataFrame, key: Column,
      posCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val splits = splitPoints(df, key, n)
    // NULL keys: null > s is null → otherwise(0) → bucket 0, matching the
    // window's asc_nulls_first order below. NaN keys: every comparison is
    // false, which would strand them in bucket 0 while Spark SORTS NaN
    // greatest — route them to the top bucket explicitly so bucket order
    // and sort order agree.
    val isFloating = df.select(key).schema.head.dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => true
      case _ => false
    }
    val bucketOf: Column =
      if (splits.isEmpty) lit(0)
      else {
        val fold =
          splits.map(s => when(key > lit(s), 1).otherwise(0)).reduce(_ + _)
        if (isFloating) when(isnan(key), lit(splits.size)).otherwise(fold)
        else fold
      }
    // Per-bucket base offsets stay IN the plan as a broadcast subquery (a
    // key-column-pruned aggregate down to ≤ n rows, then a cumulative sum
    // over those n rows) — no extra driver action, and the counts subtree
    // executes inside the same job as the final pass.
    val cumw = Window.orderBy(col("__gp_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(bucketOf.as("__gp_b"))
      .agg(count(lit(1)).as("__gp_c"))
      .select(col("__gp_b"),
        coalesce(sum(col("__gp_c")).over(cumw), lit(0L)).as("__gp_base"))
    val rn = row_number().over(
      Window.partitionBy(col("__gp_b")).orderBy(key.asc_nulls_first))
    df.withColumn("__gp_b", bucketOf)
      .join(broadcast(offsets), "__gp_b")
      .withColumn(posCol, col("__gp_base") + rn.cast("long") - 1L)
      .drop("__gp_b", "__gp_base")
  }

  /** Driver-pinned split points for the bucket expression. Boundary QUALITY
    * only affects bucket balance — positions are correct for ANY boundary
    * set, because every branch of the plan evaluates the same literal
    * splits. So an approximate one-pass answer is ideal: numeric keys get
    * `percentile_approx` (a single key-column-pruned aggregate job); other
    * orderable types fall back to a pure hash-mod sample (count job +
    * pruned sample-collect job). */
  private def splitPoints(df: DataFrame, key: Column, n: Int): Seq[Any] = {
    import org.apache.spark.sql.types.NumericType
    df.select(key).schema.head.dataType match {
      case _: NumericType =>
        val ps = (1 until n).map(_.toDouble / n)
        val row = df.agg(
          percentile_approx(key, typedLit(ps), lit(1000)).as("s")).head()
        if (row.isNullAt(0)) Nil
        else row.getSeq[Any](0).filter(_ != null).distinct
      case _ =>
        val cnt = df.count()
        if (cnt == 0) return Nil
        // ~64 sample keys per target bucket: plenty for split selection,
        // tiny on the driver; the hash-mod filter is a pure predicate.
        val sampleTarget = math.max(n.toLong * 64, 2048L)
        val M = 1000000L
        val thresh = math.min(M, (M * sampleTarget) / cnt + 1)
        val sample = df
          .filter(pmod(xxhash64(key), lit(M)) < lit(thresh))
          .select(key.as("__gp_k")).orderBy(col("__gp_k").asc_nulls_first)
          .collect().map(_.get(0)).filter(_ != null).toSeq
        val m = sample.length
        if (m == 0) Nil
        else (1 until n).map(i => sample((i.toLong * m / n).toInt)).distinct
    }
  }

  /** Multi-column fallback: ONE sorted RDD and `zipWithIndex` — the
    * RangePartitioner is constructed once for the single RDD DAG, so the
    * count job and the data job share the same shuffle files and
    * boundaries, and both the sort and the indexing are fully parallel.
    * Costs row boxing + a codegen break; the single-key path above avoids
    * both. */
  private def zipWithIndexPos(df: DataFrame, sortCols: Seq[Column],
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
    val spark = df.sparkSession
    // The dictionary MUST end broadcast-small (it feeds broadcast(dict)
    // below), so collecting the distinct values is bounded by the exact
    // same limit the broadcast imposes — the same bounded-collect contract
    // as Reshape.getDummies. The distinct is a distributed two-stage
    // aggregate; only the ALREADY-SMALL result reaches the driver, where
    // sort order assigns the dense codes. Unbounded-cardinality columns
    // need a shuffle-join factorize, not a dictionary, by definition.
    val values = df.select(col(valueCol))
      .filter(col(valueCol).isNotNull).distinct()
      .orderBy(col(valueCol))
      .collect().map(_.get(0))
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      df.schema(valueCol).copy(name = valueCol),
      StructField(codeCol, org.apache.spark.sql.types.IntegerType,
        nullable = false)))
    val dict = spark.createDataFrame(
      values.zipWithIndex.map { case (v, i) => Row(v, i) }.toSeq.asJava,
      schema)
    df.join(broadcast(dict), Seq(valueCol), "left")
      .withColumn(codeCol, coalesce(col(codeCol), lit(-1)))
  }
}
