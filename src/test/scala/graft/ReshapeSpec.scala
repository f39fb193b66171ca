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
}
