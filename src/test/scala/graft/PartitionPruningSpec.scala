package graft

import org.apache.spark.sql.functions._

/** The sink-side scale story: hive-style partitioned parquet writes must
  * prune to the selected partitions at read time (at 100 TB, reading 1/N of
  * the files is the difference between seconds and hours).
  */
class PartitionPruningSpec extends SparkTestBase {
  import spark.implicits._

  test("partitionBy write + filtered read prunes partitions in the scan") {
    val dir = "/tmp/graft_partition_pruning"
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    events.write.partitionBy("event_type").mode("overwrite").parquet(dir)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val clicks = spark.read.parquet(dir).filter($"event_type" === "click")
      val plan = clicks.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
        plan.contains("(event_type") && plan.contains("= click"), plan)
      // pruning must not change results
      val expected = events.filter($"event_type" === "click").count()
      assert(clicks.count() === expected && expected > 0)
      // and the unfiltered frame sees several partition directories (so the
      // PartitionFilters above genuinely select a strict subset)
      val allTypes = spark.read.parquet(dir)
        .select("event_type").distinct().count()
      assert(allTypes > 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
