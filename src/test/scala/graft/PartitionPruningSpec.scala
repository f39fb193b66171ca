package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Hive-style partitioned layout: directory partitioning is the third leg
  * of the layout story (bucketing = co-located joins, z-order = multi-dim
  * file pruning, partitionBy = whole-directory pruning). At 100 TB a date/
  * category-partitioned fact table turns a selective filter into a scan of
  * a few directories instead of the whole table — statically when the
  * predicate is literal, dynamically (DPP) when it arrives through a join
  * with a filtered dimension.
  */
class PartitionPruningSpec extends SparkTestBase {
  import spark.implicits._

  /** Execute `df` fully and return (scan, plan string) with AQE off, so
    * the physical scan node and its metrics are inspectable (the AQE
    * wrapper is opaque to collect()). */
  private def executedScan(df: org.apache.spark.sql.DataFrame)
      : (FileSourceScanExec, String) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      df.queryExecution.executedPlan // force while AQE is off
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.size == 1, df.queryExecution.executedPlan.toString)
      (scans.head, df.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("static partition pruning: a literal filter reads only its directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_partprune")
    try {
      val types = graft.queries.tbl(spark, sf0001, "events")
        .select($"event_type").distinct().count()
      assert(types >= 3, "fixture needs several partitions to prune")
      graft.queries.tbl(spark, sf0001, "events")
        .write.partitionBy("event_type").parquet(s"$dir/ev")
      val filtered = spark.read.parquet(s"$dir/ev")
        .filter($"event_type" === "click")
      val (scan, plan) = executedScan(filtered)
      assert(plan.contains("PartitionFilters"), plan)
      // the pruning-relevant metric: the scan OPENED one directory's
      // files, not one-per-partition-value
      assert(scan.metrics("numFiles").value == 1,
        s"expected 1 file read, got ${scan.metrics("numFiles").value}:\n$plan")
      // and semantics match the unpartitioned read
      val expected = graft.queries.tbl(spark, sf0001, "events")
        .filter($"event_type" === "click").count()
      assert(filtered.count() == expected)
    } finally {
      graft.queries.Streaming.deleteRecursively(dir)
    }
  }

  test("dynamic partition pruning: a filtered dim join prunes fact partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp")
    try {
      graft.queries.tbl(spark, sf0001, "events")
        .write.partitionBy("event_type").parquet(s"$dir/ev")
      // the dim must be a FILE source: a local relation constant-folds its
      // filter away, leaving no filterable scan for DPP to latch onto
      Seq(("click", 1L), ("view", 2L), ("purchase", 3L),
          ("signup", 4L), ("error", 5L))
        .toDF("event_type", "type_id").write.parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/ev")
      val dim = spark.read.parquet(s"$dir/dim")
      // the partition filter is NOT a literal on the fact side — it only
      // exists through the dim's filter, which DPP pushes into the fact
      // scan as a runtime subquery filter
      val joined = fact.join(dim.filter($"type_id" === 1L), "event_type")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic pruning subquery in fact scan:\n$plan")
      val expected = graft.queries.tbl(spark, sf0001, "events")
        .filter($"event_type" === "click").count()
      assert(joined.count() == expected)
    } finally {
      graft.queries.Streaming.deleteRecursively(dir)
    }
  }
}
