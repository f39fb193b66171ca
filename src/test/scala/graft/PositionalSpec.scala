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
      .map(r => Option(r.getString(0)) -> r.getLong(1))
    assert(out.length === 4)
    assert(out.toSet === Set(Some("a") -> 0L, Some("b") -> 1L, None -> -1L))
    assert(out.count(_ == (Some("b") -> 1L)) === 2)
  }

  test("factorizeShuffle assigns the same codes as the dictionary path") {
    val df = (0 until 300).map(i => s"val_${i % 37}").toDF("v")
      .union(Seq.fill(5)(null.asInstanceOf[String]).toDF("v"))
    def codes(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toSet
    assert(codes(Positional.factorizeShuffle(df, "v")) ===
      codes(Positional.factorize(df, "v")))
  }

  test("factorize auto-switches to the shuffle path above maxCategories") {
    val df = Seq("c", "a", "b", "a", null).toDF("v")
    // 3 distinct > maxCategories=2 → shuffle path, same answer
    val out = Positional.factorize(df, "v", maxCategories = 2).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toSet
    assert(out === Set(Some("a") -> 0L, Some("b") -> 1L, Some("c") -> 2L,
      None -> -1L))
  }

  test("multi-column positions equal local sort rank for composite keys") {
    val rows = scala.util.Random.shuffle(
      (for { a <- 0L until 20L; b <- 0L until 25L } yield (a, b)).toList)
    val df = rows.toDF("a", "b").repartition(5)
    val out = Positional.withGlobalPos(df, Seq($"a", $"b"), "pos")
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.sorted.zipWithIndex
      .map { case (k, i) => k -> i.toLong }.toMap
    assert(got === want)
    // the multi-key path must stay in the declarative plan — no RDD
    // drop-out (the old zipWithIndex fallback showed up as ExistingRDD)
    assert(!out.queryExecution.executedPlan.toString.contains("ExistingRDD"))
  }

  test("multi-column: tie-heavy leading column rides the tie-break") {
    // only 3 distinct leading values — every split lands on a tie, all
    // ordering comes from the second column
    val rows = scala.util.Random.shuffle(
      (0 until 300).map(i => ((i % 3).toLong, i.toLong)).toList)
    val got = Positional.withGlobalPos(rows.toDF("a", "b").repartition(4),
        Seq($"a", $"b"), "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.sorted.zipWithIndex
      .map { case (k, i) => k -> i.toLong }.toMap
    assert(got === want)
  }

  test("takePositions returns exactly the requested ranks") {
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val got = Positional.takePositions(df, Seq($"k"), Seq(0L, 42L, 99L))
      .collect().map(r => r.getLong(2) -> r.getLong(0)).toMap
    assert(got === Map(0L -> 0L, 42L -> 42L, 99L -> 99L))
  }
}
