package graft

import graft.operators.{RangeJoin, Sessionize}

/** Pins bin-blocked range-join equivalence to the naive BETWEEN join, and
  * sessionization boundary semantics. */
class RangeSessionSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("pointInInterval == naive BETWEEN join, across bin widths") {
    // deterministic synthetic: points 0..199 ×7, intervals of varied spans
    val pts = (0 until 200).map(i => (i % 5L, i.toLong * 7))
      .toDF("k", "p")
    val ivs = ((0 until 60).map { i =>
      val s = i.toLong * 23
      (i % 5L, s, s + (i % 4) * 40L, i.toLong)
    } :+ ((0L, 100L, 50L, 999L)))  // reversed interval: matches nothing
      .toDF("k", "s", "e", "ivid")
    val naive = pts.join(ivs, Seq("k"))
      .filter($"p" >= $"s" && $"p" <= $"e")
      .select($"k", $"p", $"ivid")
    val expected = naive.collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)
    for (bw <- Seq(1L, 10L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e",
          binWidth = bw)
        .select($"k", $"p", $"iv_ivid".as("ivid"))
        .collect().map(_.toSeq).toSet
      assert(got === expected, s"binWidth=$bw diverged from naive join")
    }
  }

  test("pointInInterval plans an equi-join, not nested-loop") {
    val pts = Seq((1L, 5L)).toDF("k", "p")
    val ivs = Seq((1L, 0L, 10L, 9L)).toDF("k", "s", "e", "ivid")
    val plan = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("sessionize: boundary is strictly greater than gap; ids are 1-based") {
    val ev = Seq(
      (1L, 0L), (1L, 100L), (1L, 200L),   // gap=100 steps stay in-session
      (1L, 301L),                          // 101 > 100 → new session
      (2L, 50L))                           // separate key
      .toDF("u", "t")
    val got = Sessionize.sessionize(ev, Seq("u"), "t", gap = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 0L)) === 1L)
    assert(got((1L, 100L)) === 1L)
    assert(got((1L, 200L)) === 1L)
    assert(got((1L, 301L)) === 2L)
    assert(got((2L, 50L)) === 1L)
  }

  test("sessionize plans ONE exchange + sort for both window steps") {
    val ev = Seq((1L, 0L), (1L, 5L)).toDF("u", "t")
    val plan = Sessionize.sessionize(ev, Seq("u"), "t", 100L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected one shuffle, plan:\n$plan")
  }
}
