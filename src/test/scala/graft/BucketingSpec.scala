package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Co-bucketed joins must plan without a shuffle on either side. */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("join of two co-bucketed tables has no shuffle exchange") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 4,
      Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey",
        "o_orderkey"), "b_lineitem", Seq("o_orderkey"), 4, Seq("o_orderkey"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketing.readBucketed(spark, "b_orders")
        .join(Bucketing.readBucketed(spark, "b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it computes the same result as the plain join
      val expected = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("q_join_bucketed gate: the catalog-read join itself plans no " +
      "exchange below the SortMergeJoin") {
    // run the gate once so the bucketed tables exist, then audit the plan
    // of the same catalog-read join the gate executes: the only Exchange
    // allowed is the one ABOVE the join for the groupBy — the join inputs
    // must come straight from the bucketed scans
    SparkEntry.queries("q_join_bucketed")(spark, sf0001).collect()
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketing.readBucketed(spark, "graft_gate_b_lineitem")
        .join(Bucketing.readBucketed(spark, "graft_gate_b_orders"),
          $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"gate's bucketed join still shuffles:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan does not report bucketing:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
