package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins — the
  * pre-partitioning story for fact tables that are joined on the same key
  * query after query (at 100 TB, re-shuffling the fact table per query is
  * the dominant cost; bucketing pays the shuffle once at write time).
  *
  * Joining two tables bucketed by the same key into the same bucket count
  * plans a SortMergeJoin with NO Exchange on either side (asserted in
  * BucketingSpec); sortBy additionally removes the Sort.
  */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** Read a bucketed table (bucket metadata comes from the catalog — a
    * plain `spark.read.parquet` on the files would lose it). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
