package graft

import graft.operators.AsofJoin

/** Pins merge_asof/ASOF-JOIN semantics for the union+window decomposition:
  * backward/forward direction, inclusivity at equal times, tolerance
  * nulling, unmatched-left retention, and multi-key isolation. */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val left = Seq(
    // (key, t, tag)
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 30L, "l3"),
    ("b", 15L, "l4"), ("c", 5L, "l5"))
    .toDF("k", "t", "tag")
  private val right = Seq(
    ("a", 10L, 1.0), ("a", 25L, 2.0), ("b", 14L, 3.0), ("b", 16L, 4.0))
    .toDF("k", "rt", "v")

  private def run(dir: String, tol: Option[Long] = None): Map[String, (Any, Any)] =
    AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("v"),
        direction = dir, tolerance = tol)
      .collect()
      .map(r => r.getAs[String]("tag") ->
        ((r.getAs[Any]("asof_v"), r.getAs[Any]("asof_rt")))).toMap

  test("backward: greatest right time <= left time, inclusive at equality") {
    val m = run("backward")
    assert(m("l1") === ((1.0, 10L)))  // equal time matches (inclusive)
    assert(m("l2") === ((1.0, 10L)))  // 25 is in the future
    assert(m("l3") === ((2.0, 25L)))
    assert(m("l4") === ((3.0, 14L)))  // not 16 (future)
    assert(m("l5") === ((null, null))) // key with no right rows: left kept
  }

  test("forward: least right time >= left time, inclusive at equality") {
    val m = run("forward")
    assert(m("l1") === ((1.0, 10L)))
    assert(m("l2") === ((2.0, 25L)))
    assert(m("l3") === ((null, null))) // nothing at or after 30
    assert(m("l4") === ((4.0, 16L)))
    assert(m("l5") === ((null, null)))
  }

  test("tolerance nulls matches beyond the gap but keeps the left row") {
    val m = run("backward", tol = Some(5L))
    assert(m("l1") === ((1.0, 10L)))  // gap 0
    assert(m("l2") === ((null, null))) // gap 10 > 5
    assert(m("l3") === ((2.0, 25L)))  // gap 5 == tol (inclusive)
    assert(run("backward").size === m.size) // no left rows dropped
  }

  test("row counts: exactly one output row per left row, no multiplication") {
    val out = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("v"))
    assert(out.count() === left.count())
    assert(out.columns.toSeq ===
      Seq("k", "t", "tag", "asof_v", "asof_rt"))
  }

  test("null left time matches nothing in either direction") {
    val l = Seq(("a", Some(20L), "has_t"), ("a", Option.empty[Long], "no_t"))
      .toDF("k", "t", "tag")
    val r = Seq(("a", 10L, 1.0)).toDF("k", "rt", "v")
    for (dir <- Seq("backward", "forward")) {
      val m = AsofJoin.asof(l, r, Seq("k"), "t", "rt", Seq("v"),
          direction = dir)
        .collect().map(x => x.getAs[String]("tag") -> x.getAs[Any]("asof_v"))
        .toMap
      assert(m("no_t") === null, s"direction=$dir")
      assert(m.size === 2) // the null-time row is kept, unmatched
    }
  }

  test("multi-key: matches isolate per composite key") {
    val l2 = Seq(("a", 1L, 10L, "l1"), ("a", 2L, 10L, "l2"))
      .toDF("k1", "k2", "t", "tag")
    val r2 = Seq(("a", 1L, 5L, 9.0)).toDF("k1", "k2", "rt", "v")
    val m = AsofJoin.asof(l2, r2, Seq("k1", "k2"), "t", "rt", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[Any]("asof_v"))
      .toMap
    assert(m("l1") === 9.0)  // (a,1) matches
    assert(m("l2") === null) // (a,2) shares k1 only — no leak across k2
  }

  test("nearest: smaller gap wins, backward breaks ties") {
    val m = run("nearest")
    assert(m("l1") === ((1.0, 10L)))   // exact match, gap 0
    assert(m("l2") === ((2.0, 25L)))   // forward gap 5 < backward gap 10
    assert(m("l3") === ((2.0, 25L)))   // backward gap 5, nothing forward
    assert(m("l4") === ((3.0, 14L)))   // TIE (gap 1 both ways) → backward
    assert(m("l5") === ((null, null)))
  }

  test("nearest with tolerance nulls both directions beyond the gap") {
    val l = Seq(("a", 100L, "far")).toDF("k", "t", "tag")
    val r = Seq(("a", 80L, 1.0), ("a", 130L, 2.0)).toDF("k", "rt", "v")
    // gaps 20 back / 30 forward; tol 25 keeps only backward, tol 10 none
    val keep = AsofJoin.asof(l, r, Seq("k"), "t", "rt", Seq("v"),
      direction = "nearest", tolerance = Some(25L)).head()
    assert(keep.getAs[Any]("asof_v") === 1.0)
    val none = AsofJoin.asof(l, r, Seq("k"), "t", "rt", Seq("v"),
      direction = "nearest", tolerance = Some(10L)).head()
    assert(none.getAs[Any]("asof_v") === null)
  }

  test("allowExactMatches=false excludes same-time right rows") {
    // backward: l1 at t=10 must skip the right row at 10 and find nothing
    // earlier; l2 at 20 still matches 10
    val m = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("v"),
        allowExactMatches = false)
      .collect().map(r => r.getAs[String]("tag") ->
        ((r.getAs[Any]("asof_v"), r.getAs[Any]("asof_rt")))).toMap
    assert(m("l1") === ((null, null)))
    assert(m("l2") === ((1.0, 10L)))
    // forward: l1 at 10 skips 10, takes 25
    val f = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("v"),
        direction = "forward", allowExactMatches = false)
      .collect().map(r => r.getAs[String]("tag") ->
        r.getAs[Any]("asof_rt")).toMap
    assert(f("l1") === 25L)
  }

  test("match atomicity: a matched row's NULL payload stays NULL") {
    // the matched right row (t=2) has v=NULL; the older row's v=5.0 must
    // NOT leak forward into the match (pandas merge_asof returns the
    // matched row's NaN)
    val l = Seq(("a", 3L, "l1")).toDF("k", "t", "tag")
    val r = Seq(("a", 1L, Some(5.0)), ("a", 2L, Option.empty[Double]))
      .toDF("k", "rt", "v")
    val row = AsofJoin.asof(l, r, Seq("k"), "t", "rt", Seq("v")).head()
    assert(row.getAs[Any]("asof_rt") === 2L)
    assert(row.getAs[Any]("asof_v") === null)
  }

  test("right rows with NULL time are never a match") {
    val l = Seq(("a", 10L, "l1"), ("b", 10L, "l2")).toDF("k", "t", "tag")
    val r = Seq(("a", Option.empty[Long], 9.0), ("a", Some(1L), 1.0),
        ("b", Option.empty[Long], 8.0))
      .toDF("k", "rt", "v")
    for (dir <- Seq("backward", "forward")) {
      val m = AsofJoin.asof(l, r, Seq("k"), "t", "rt", Seq("v"),
          direction = dir)
        .collect().map(x => x.getAs[String]("tag") ->
          ((x.getAs[Any]("asof_v"), x.getAs[Any]("asof_rt")))).toMap
      // key b has ONLY a null-time right row: left kept, unmatched
      assert(m("l2") === ((null, null)), s"direction=$dir")
      if (dir == "backward") assert(m("l1") === ((1.0, 1L)))
      assert(m.size === 2)
    }
  }

  test("duplicate (key, rightTime): deterministic greatest-payload winner") {
    val l = Seq(("a", 10L, "l1")).toDF("k", "t", "tag")
    val r = Seq(("a", 5L, 1.0), ("a", 5L, 2.0), ("a", 5L, 0.5))
      .toDF("k", "rt", "v")
    // repartition the right side differently across runs — the winner must
    // not depend on physical layout
    for (p <- Seq(1, 3)) {
      val row = AsofJoin.asof(l, r.repartition(p), Seq("k"), "t", "rt",
        Seq("v")).head()
      assert(row.getAs[Double]("asof_v") === 2.0, s"partitions=$p")
      assert(row.getAs[Long]("asof_rt") === 5L)
    }
  }

  test("plan shape: no cartesian/range join — one shuffle by key + window") {
    val out = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("v"))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("BroadcastNestedLoopJoin"))
    assert(physical.contains("Window"))
  }
}
