package graft

import org.apache.spark.sql.functions._
import graft.operators.Reshape

/** getDummies contract: indicator columns, and the driver-OOM guard — the
  * category dictionary is driver-resident by design (pandas contract), so a
  * high-cardinality column must fail fast, not collect.
  */
class ReshapeSpec extends SparkTestBase {
  import spark.implicits._

  test("getDummies emits sorted 0/1 indicator columns") {
    val df = Seq((1L, "a|b"), (2L, "b|c"), (3L, "a")).toDF("id", "tags")
    val out = Reshape.getDummies(df, $"tags", "|", Seq($"id"))
    assert(out.columns.toSeq === Seq("id", "a", "b", "c"))
    val rows = out.orderBy($"id").collect()
    assert(rows.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ===
      Seq((1, 1, 0), (0, 1, 1), (1, 0, 0)))
  }

  test("getDummies fails fast past maxCategories instead of OOMing") {
    val df = (1 to 50).map(i => (i.toLong, s"tag$i")).toDF("id", "tags")
    val e = intercept[IllegalArgumentException] {
      Reshape.getDummies(df, $"tags", "|", Seq($"id"), maxCategories = 10)
    }
    assert(e.getMessage.contains("maxCategories"))
    // and succeeds when the cap admits the dictionary
    val ok = Reshape.getDummies(df, $"tags", "|", Seq($"id"),
      maxCategories = 50)
    assert(ok.columns.length === 51)
  }

  test("q_pivot reads the fact table once, reduced map-side before any " +
      "shuffle (explicit values: no discovery job)") {
    // The scale contract of pivot-with-explicit-values: ONE scan of the
    // fact table (no separate distinct-scan job to discover the pivot
    // domain — that's what omitting the values list costs at 100 TB),
    // pruned to the three referenced columns, with a partial HashAggregate
    // directly over the scan so every Exchange in the plan carries
    // already-reduced rows (≤ |priority × status| per map partition).
    // Spark's two-phase PivotFirst adds a second tiny-input shuffle; that
    // is fine — what must never appear is a full-table shuffle or Expand.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q_pivot")(spark, sf0001)
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size === 1, s"pivot should scan orders once:\n$plan")
      assert(scans.head.requiredSchema.fieldNames.toSet ===
        Set("o_orderstatus", "o_totalprice", "o_orderpriority"), plan.toString)
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.ExpandExec => e }.isEmpty,
        s"pivot should not Expand:\n$plan")
      // the bottom-most Exchange's child must already be an aggregate
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size <= 3, plan.toString)
      val bottom = exchanges.last // collect is pre-order; last = deepest
      // the aggregate sits inside a WholeStageCodegen wrapper — search the
      // subtree rather than the direct child
      assert(bottom.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty, s"first shuffle input not map-side reduced:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q_unpivot is a narrow Expand over a pruned scan") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val base = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_discount", $"l_tax")
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"l_quantity", $"l_discount", $"l_tax"),
          "measure", "val")
      val plan = base.queryExecution.executedPlan
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.ExpandExec => e }.nonEmpty,
        plan.toString)
      // no shuffle anywhere: unpivot itself is map-side
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, plan.toString)
      // 3 output rows per input row, nulls preserved (Spark semantics the
      // oracle mirrors with INCLUDE NULLS)
      val n = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
      assert(base.count() === 3 * n)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
