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

  test("bucketed band index: the incremental probe never shuffles the " +
      "index side") {
    // The production shape Dedup.dedupAgainstIndex's scaladoc promises:
    // persist the corpus band index BUCKETED by its join key (band, key),
    // and the daily probe join reads the index straight from the bucketed
    // scan — only the (small) new-batch bands shuffle to meet it. At
    // 100 TB the index is the corpus-sized side; never re-shuffling it is
    // the point of persisting it at all.
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val d = graft.queries.tbl(spark, sf0001, "documents")
    val isNew = col("doc_id") % 5 === 0
    val corpus = d.filter(!isNew)
    val idx = Dedup.bandIndex(corpus, "text", "doc_id", k = 3)
    Bucketing.writeBucketed(idx, "b_band_index", Seq("band", "key"), 4)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val out = Dedup.dedupAgainstIndex(
        d.filter(isNew), "text", "doc_id", k = 3, threshold = 0.8,
        index = Bucketing.readBucketed(spark, "b_band_index"),
        corpus = corpus)
      val plan = out.queryExecution.executedPlan
      val bucketScans = plan.collect {
        case f: FileSourceScanExec if f.bucketedScan => f
      }
      assert(bucketScans.nonEmpty, "index scan lost its bucket metadata")
      // the promise is about the JOIN INPUT: the bucketed scan must feed
      // its sort-merge join with no exchange on that side (post-join
      // aggregation exchanges carry only reduced candidate rows and are
      // expected)
      val joinFedDirectly = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.exists { j =>
        Seq(j.left, j.right).exists { side =>
          side.collect {
            case f: FileSourceScanExec if f.bucketedScan => f
          }.nonEmpty &&
            side.collect { case e: ShuffleExchangeExec => e }.isEmpty
        }
      }
      assert(joinFedDirectly,
        s"bucketed index shuffles before its probe join:\n$plan")
      // and the bucketed probe returns the unbucketed probe's verdicts
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getBoolean(2))
      val got = out.select($"new_id", $"old_id", $"is_dup")
        .collect().map(key).toSet
      val expected = Dedup.dedupAgainstIndex(
          d.filter(isNew), "text", "doc_id", k = 3, threshold = 0.8,
          index = idx, corpus = corpus)
        .select($"new_id", $"old_id", $"is_dup").collect().map(key).toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_band_index")
    }
  }
}
