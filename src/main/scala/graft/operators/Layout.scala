package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) clustering for
  * write-time file organization.
  *
  * WHY (the 100 TB story): parquet scan pruning is only as good as the
  * per-file min/max ranges of the filtered columns. A table sorted by ONE
  * column prunes perfectly on that column and not at all on any other — a
  * box predicate on a second dimension scans every file. Interleaving the
  * bits of k columns into one sort key (the Z-/Morton curve) gives every
  * file a tight bounding box in ALL k dimensions at once, so a selective
  * predicate on ANY clustered column prunes most files. This is the same
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY` — here expressed as
  * a plain codegen'd column expression plus `repartitionByRange`, nothing
  * engine-private. The reference has no layout optimizer (it computes on
  * whatever chunking pandas hands it — /root/reference/fletcher/base.py
  * ChunkedArray passthrough); this is a beyond-parity scale component.
  *
  * All arithmetic is integer shift/mask work on BIGINT, so the z-value is
  * a pure deterministic function of the row — cross-engine replayable in
  * SQL (the oracle mirrors it with the same shifts in DuckDB).
  */
object Layout {

  /** Morton z-value of `cols`, each confined to `bits` bits: bit `j` of
    * column `c` lands at interleaved position `j * n + c`. Columns must
    * already be non-negative and < 2^bits (see [[zRank]] for the generic
    * quantize-first path); values are masked with pmod to keep the
    * expression total on arbitrary longs. With n·bits ≤ 62 the result (and
    * the 1L << bits mask) fits a positive BIGINT. Built entirely from codegen'd bitwise primitives — one
    * whole-stage-codegen projection, no UDF. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zValue needs at least one column")
    require(bits >= 1, "zValue needs at least one bit per column")
    // <= 62, not 63: the pmod mask is 1L << bits, which must stay positive
    require(n * bits <= 62, s"$n cols x $bits bits overflows a signed long")
    val mask = 1L << bits
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(
      shiftright(pmod(c.cast("long"), lit(mask)), j).bitwiseAND(lit(1L)),
      j * n + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Quantile-rank a numeric column into [0, 2^bits): ties share a rank,
    * so equal values always co-locate. This is the generic front-end for
    * columns whose raw domain exceeds (or badly underfills) 2^bits — the
    * same rank-then-interleave shape Delta's OPTIMIZE ZORDER uses, and the
    * required step when clustered columns have unequal bit-widths (raw
    * interleave of an 8-bit column with a 4-bit one degenerates to a
    * lexicographic sort on the wider column).
    *
    * Scale shape: boundaries come from the distributed approx-quantile
    * sketch (one pass, partial-merged), the driver holds only the
    * 2^bits − 1 boundary doubles (bounded collect, ≤ 32 KB at bits = 12),
    * and bucket assignment is a codegen'd fold over literal boundaries —
    * no global window, no single-reducer sort. An unpartitioned
    * percent_rank window would funnel all rows through ONE task, which is
    * exactly the shape PlanGuardSpec forbids in query plans. */
  def zRank(df: DataFrame, colName: String, bits: Int): Column = {
    val buckets = 1 << bits
    require(bits >= 1 && bits <= 12, "zRank supports 1..12 bits per column")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = df.stat.approxQuantile(colName, probs, 1e-4)
    val c = df.col(colName).cast("double")
    // ONE array literal folded with `aggregate` — not 2^bits − 1 chained
    // when() nodes, which would bloat the plan and overflow codegen's
    // method limit at the upper bits settings (same convention as
    // Similarity.lshBucket's plane literal).
    aggregate(typedLit(bounds.distinct.toSeq), lit(0L),
      (acc, b) => acc + when(c > b, lit(1L)).otherwise(lit(0L)))
  }

  /** Small-file compaction: rewrite a file-backed DataFrame into
    * ~`targetBytes`-sized output partitions. The 100 TB problem this
    * solves is the inverse of splitting: a streaming ingest or
    * fine-partitioned ETL leaves millions of KB-scale files, and every
    * downstream scan then pays one task + one footer read + one open per
    * file — compaction is the standard periodic rewrite (Delta/Iceberg
    * `OPTIMIZE`). Sizing uses the REAL on-disk bytes of the input files
    * (`df.inputFiles`, a driver-side listing the scan already performed —
    * bounded by file count, no data pass), not Catalyst's post-codec
    * size estimate. Shrinking uses `coalesce` (no shuffle: tasks just
    * read several input files each); growing uses a round-robin
    * `repartition` (a genuine split needs the shuffle). */
  def compact(df: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val files = df.inputFiles
    require(files.nonEmpty,
      "compact sizes from input files; this DataFrame exposes none")
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val total = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    if (n < df.rdd.getNumPartitions) df.coalesce(n) else df.repartition(n)
  }

  /** Cluster `df` for multi-dimensional scan pruning: range-partition by
    * the interleaved z-value into `numFiles` output partitions and sort
    * within each, so each written file covers a contiguous z-range — a
    * tight bounding box in every clustered dimension. The caller writes
    * the result; the helper column is dropped from the output. */
  def clusterByZ(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int): DataFrame = {
    val z = zValue(cols.map(df.col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
