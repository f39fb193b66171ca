package graft

import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (SPARK-32268): for a shuffle join
  * whose build side carries a selective predicate, Catalyst plants a bloom
  * filter built from the filtered build-side keys as a row-level filter on
  * the probe side's SCAN — so at 100 TB the probe side drops non-matching
  * rows before the shuffle instead of shuffling everything and discarding
  * at the join. This is an optimizer capability the engine inherits by
  * keeping plans declarative (no mapPartitions wrappers between scan and
  * join); these tests pin that our query shapes remain eligible and that
  * the rewrite preserves results.
  *
  * The size thresholds are production guards (building a filter from a
  * huge build side costs more than it saves); test data sits below them,
  * so the specs set thresholds explicitly rather than relying on defaults.
  */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  private def withConfs[A](kv: (String, String)*)(body: => A): A = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def joined = {
    val o = graft.queries.tbl(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
    val l = graft.queries.tbl(spark, sf0001, "lineitem")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_quantity", $"o_totalprice")
  }

  private def bloomFilters(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect { case p => p.expressions }
      .flatten.flatMap(_.collect { case m: BloomFilterMightContain => m })

  test("selective shuffle join injects might_contain on the probe side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = joined
      assert(bloomFilters(df).nonEmpty,
        "expected a runtime bloom filter in:\n" +
          df.queryExecution.optimizedPlan.treeString)
      // the rewrite is an optimization, not a semantics change
      val expected = withConfs(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        joined.count()
      }
      assert(df.count() == expected)
    }
  }

  test("broadcast-eligible joins do NOT pay for a runtime filter") {
    // When the join broadcasts, the probe side never shuffles the filtered
    // rows anyway — injecting a bloom filter would be pure overhead, and
    // the optimizer knows it.
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        "0",
      "spark.sql.adaptive.enabled" -> "false") {
      assert(bloomFilters(joined).isEmpty)
    }
  }
}
