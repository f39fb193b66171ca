package graft

import org.apache.spark.sql.functions._
import graft.operators.Positional

/** Direct unit coverage for the sampled-splits global-position operator:
  * position correctness against a local sort, null/NaN key placement, and
  * layout invariance (the query gates cover the long-key paths; this pins
  * the floating-point edge the gates never see). */
class PositionalSpec extends SparkTestBase {
  import spark.implicits._

  test("positions equal local sort rank for shuffled long keys") {
    val keys = scala.util.Random.shuffle((0L until 500L).toList)
    val df = keys.toDF("k")
    val got = Positional.withGlobalPos(df, Seq($"k"), "pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L until 500L).map(k => k -> k).toMap)
  }

  test("NaN double keys take the top positions (sort-order agreement)") {
    val df = Seq(2.5, Double.NaN, 1.0, 3.5, Double.NaN, 0.5).toDF("k")
    val got = Positional.withGlobalPos(df, Seq($"k"), "pos")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val nanPos = got.collect { case (k, p) if k.isNaN => p }.toSet
    val finitePos = got.collect { case (k, p) if !k.isNaN => p }.toSet
    assert(nanPos === Set(4L, 5L), s"NaN at $nanPos") // greatest, like sort
    assert(finitePos === Set(0L, 1L, 2L, 3L))
    // finite section is rank-ordered
    val finite = got.filterNot(_._1.isNaN).sortBy(_._2).map(_._1)
    assert(finite === finite.sorted)
  }

  test("factorize keeps null rows with code -1 (na_sentinel)") {
    val df = Seq(Some("b"), None, Some("a"), Some("b"))
      .toDF("v")
    val out = Positional.factorize(df, "v").collect()
      .map(r => Option(r.getString(0)) -> r.getInt(1))
    assert(out.length === 4)
    assert(out.toSet === Set(Some("a") -> 0, Some("b") -> 1, None -> -1))
    assert(out.count(_ == (Some("b") -> 1)) === 2)
  }

  test("takePositions returns exactly the requested ranks") {
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val got = Positional.takePositions(df, Seq($"k"), Seq(0L, 42L, 99L))
      .collect().map(r => r.getLong(2) -> r.getLong(0)).toMap
    assert(got === Map(0L -> 0L, 42L -> 42L, 99L -> 99L))
  }
}
