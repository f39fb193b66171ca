package graft

import org.apache.spark.sql.functions._
import graft.tools.PlanMetrics

/** Pins what [[graft.tools.PlanMetrics]] reads out of executed plans: the
  * bench's queries_shuffle_mb / queries_broadcast_mb columns are only
  * trustworthy if zero means "no exchange ran" and nonzero tracks the
  * exchanges the plan actually executed.
  */
class PlanMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def volume(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    PlanMetrics.exchangeVolume(df)
  }

  test("narrow filter+project moves zero exchange bytes") {
    val v = volume(spark.range(0, 10000).toDF("id")
      .filter($"id" % 7 === 0).select(($"id" * 2).as("x")))
    assert(v.shuffleWritten === 0L)
    assert(v.shuffleRecords === 0L)
    assert(v.broadcastBytes === 0L)
  }

  test("groupBy shuffles bytes and records; partial agg keeps records <= groups x partitions") {
    val df = spark.range(0, 100000).toDF("id")
      .groupBy(($"id" % 10).as("k")).agg(sum($"id").as("s"))
    val v = volume(df)
    assert(v.shuffleWritten > 0L)
    // map-side combine: each of the 4 input partitions emits at most one
    // partial row per group — far below the 100k input rows. A dropped
    // partial aggregate would shuffle ~100k records and fail here.
    assert(v.shuffleRecords > 0L && v.shuffleRecords <= 10L * 4L,
      s"expected <= 40 partial rows through the exchange, saw ${v.shuffleRecords}")
  }

  test("broadcast join reports broadcast bytes and no shuffle") {
    val big = spark.range(0, 50000).toDF("id").withColumn("k", $"id" % 100)
    val dim = spark.range(0, 100).toDF("k").withColumn("name", concat(lit("d"), $"k"))
    val v = volume(big.join(broadcast(dim), "k"))
    assert(v.broadcastBytes > 0L)
    assert(v.shuffleWritten === 0L)
  }

  test("sort-merge join (broadcast disabled) shuffles both sides, no broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = spark.range(0, 20000).toDF("k").withColumn("va", $"k" * 2)
      val b = spark.range(0, 20000).toDF("k").withColumn("vb", $"k" * 3)
      val v = volume(a.join(b, "k"))
      assert(v.shuffleWritten > 0L)
      assert(v.shuffleRecords === 40000L, // both full sides cross the wire
        s"expected 40000 records shuffled, saw ${v.shuffleRecords}")
      assert(v.broadcastBytes === 0L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE-planned query still exposes its exchanges through the stage wrappers") {
    // distinct -> exchange; under AQE the executed plan is an
    // AdaptiveSparkPlanExec whose stages wrap the exchanges. If the walk
    // failed to descend, this would read zero.
    val df = spark.range(0, 30000).toDF("id").select(($"id" % 50).as("k")).distinct()
    val v = volume(df)
    assert(v.shuffleWritten > 0L)
    assert(v.shuffleRecords <= 50L * 4L)
  }

  test("scalar subquery exchanges are counted") {
    spark.range(0, 1000).toDF("id").createOrReplaceTempView("pm_sub_t")
    val df = spark.sql(
      "SELECT id FROM pm_sub_t WHERE id > (SELECT avg(id) FROM pm_sub_t)")
    val v = volume(df)
    // the global avg aggregates through a single-partition exchange
    assert(v.shuffleWritten > 0L)
  }
}
