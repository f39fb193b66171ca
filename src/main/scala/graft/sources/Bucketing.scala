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

  /** Write `df` as a bucketed (and bucket-sorted) managed table.
    *
    * Overwrite only replaces tables the CURRENT catalog knows about; with
    * the default in-memory catalog, a managed table's directory can
    * survive a previous JVM whose catalog entry died with it, and
    * saveAsTable then fails with LOCATION_ALREADY_EXISTS. Drop the entry
    * and clear any leftover location first (Hadoop FS API, so the same
    * code holds on HDFS/object stores). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
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
