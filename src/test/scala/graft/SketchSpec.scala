package graft

import org.apache.spark.sql.functions._

/** Pins the sketch-aggregate error bounds that the q_sketches gate asserts
  * in-query (SURVEY.md §8): HyperLogLog++ distinct estimates land within
  * 3·rsd of exact, and percentile_approx on integral data with accuracy
  * 10000 lands within one unit of the exact median. The gate's boolean
  * columns (`approx_parts_ok`, `approx_median_ok`) must therefore be TRUE
  * everywhere — which is exactly what its DuckDB oracle hard-codes.
  */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")

  test("HLL distinct estimate is within 3*rsd of exact per group") {
    val rows = lineitem.groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("exact"),
        approx_count_distinct($"l_partkey", rsd = 0.05).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) <= 3 * 0.05 * exact,
        s"flag=${r.getString(0)} exact=$exact approx=$approx")
    }
  }

  test("percentile_approx(accuracy=10000) is within 1 unit of exact median") {
    val rows = lineitem.groupBy($"l_returnflag")
      .agg(
        percentile($"l_quantity", lit(0.5)).as("exact"),
        percentile_approx($"l_quantity", lit(0.5), lit(10000)).as("approx"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(1)) <= 1.0,
        s"flag=${r.getString(0)} exact=${r.getDouble(1)} approx=${r.getDouble(2)}")
    }
  }

  test("q_sketches gate booleans are all TRUE (matches the literal oracle)") {
    val df = SparkEntry.queries("q_sketches")(spark, sf0001)
    val bad = df.filter(!$"approx_parts_ok" || !$"approx_median_ok").count()
    assert(bad === 0L)
    assert(df.count() > 0)
  }

  test("HLL sketch MERGE equals a direct sketch over the union") {
    // the property that makes sketches usable as materialized rollup state:
    // merging per-group sketches must estimate the same as sketching the
    // whole column directly (Datasketches HLL union is lossless for fixed
    // lgConfigK)
    val direct = lineitem
      .agg(hll_sketch_estimate(hll_sketch_agg($"l_partkey", lit(12))))
      .head.getLong(0)
    val merged = lineitem.groupBy($"l_returnflag", $"l_linestatus")
      .agg(hll_sketch_agg($"l_partkey", lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")))
      .head.getLong(0)
    assert(merged === direct, s"merged=$merged direct=$direct")
  }

  test("q_sketch_rollup gate booleans are all TRUE") {
    val df = SparkEntry.queries("q_sketch_rollup")(spark, sf0001)
    assert(df.filter(!$"merged_est_ok").count() === 0L)
    assert(df.count() > 0)
  }
}
