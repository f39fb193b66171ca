package graft

import graft.operators.Merge

/** Keyed upsert + snapshot diff semantics, incl. the null traps. */
class MergeSpec extends SparkTestBase {

  import spark.implicits._

  test("upsert replaces matched keys and keeps the rest") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val upd = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val got = Merge.upsert(base, upd, "k")
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "B"), (3L, "c"), (9L, "Z")))
  }

  test("snapshotDiff classifies added/removed/changed, drops unchanged") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val next = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val got = Merge.snapshotDiff(prev, next, "k", Seq("v"))
      .select($"k", $"change").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("snapshotDiff: payload nulls are values, not absence") {
    // key 1: null -> null is UNCHANGED (null-safe compare); key 2:
    // "x" -> null is CHANGED; neither may classify as added/removed.
    val prev = Seq((1L, null: String), (2L, "x")).toDF("k", "v")
    val next = Seq((1L, null: String), (2L, null: String)).toDF("k", "v")
    val got = Merge.snapshotDiff(prev, next, "k", Seq("v"))
      .select($"k", $"change").as[(Long, String)].collect().toSet
    assert(got === Set((2L, "changed")))
  }

  test("upsertLatest keeps the event-time winner under out-of-order arrival") {
    // base holds (k=1, t=10); a LATE batch carries an OLDER t=5 row — blind
    // arrival-order upsert would regress the key, event-time merge must not
    val base = Seq((1L, 10L, 100L, "new"), (2L, 3L, 101L, "b"))
      .toDF("k", "t", "seq", "v")
    val late = Seq((1L, 5L, 99L, "old"), (3L, 1L, 102L, "c"))
      .toDF("k", "t", "seq", "v")
    val got = Merge.upsertLatest(base, late, "k", Seq("t", "seq"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === Set((1L, 10L, 100L, "new"), (2L, 3L, 101L, "b"),
      (3L, 1L, 102L, "c")))
  }

  test("upsertLatest breaks event-time ties on the remaining order columns") {
    val base = Seq((1L, 10L, 1L, "first")).toDF("k", "t", "seq", "v")
    val upd = Seq((1L, 10L, 2L, "second")).toDF("k", "t", "seq", "v")
    val got = Merge.upsertLatest(base, upd, "k", Seq("t", "seq"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === Set((1L, 10L, 2L, "second")))
  }

  test("scd2 builds non-overlapping inclusive intervals that tile to the " +
      "horizon; same-tick duplicates collapse to last-writer") {
    val changes = Seq(
      (1L, 10L, 100L, "v1"), (1L, 20L, 101L, "v2"), (1L, 20L, 102L, "v2b"),
      (2L, 5L, 103L, "w1")).toDF("k", "t", "seq", "v")
    val got = Merge.scd2(changes, "k", "t", Seq("seq"), horizon = 99L)
      .select($"k", $"seq", $"valid_from", $"valid_to")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 100L, 10L, 19L),  // v1 valid until one tick before the change
      (1L, 101L, 20L, 19L),  // same-tick earlier writer: EMPTY interval
      (1L, 102L, 20L, 99L),  // same-tick last writer wins, capped at horizon
      (2L, 103L, 5L, 99L)))
    // non-empty intervals per key are disjoint and cover [first, horizon]
    val live = got.filter { case (_, _, f, t) => t >= f }
    for ((k, ivs0) <- live.groupBy(_._1)) {
      val ivs = ivs0.toSeq.sortBy(_._3)
      assert(ivs.head._3 === ivs.map(_._3).min)
      assert(ivs.last._4 === 99L)
      ivs.sliding(2).foreach {
        case Seq((_, _, _, t1), (_, _, f2, _)) => assert(f2 === t1 + 1)
        case _ => ()
      }
    }
  }

  test("streaming CDC: foreachBatch upsert maintains last-writer-wins state") {
    // The standard streaming-merge sink pattern: each micro-batch merges
    // into the maintained snapshot via Merge.upsert. Batches replay in
    // order; within a batch, keys are pre-deduped by the caller (here
    // distinct by construction). End state = last write per key.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    var state = Seq.empty[(Long, String)].toDF("k", "v")
    val q = in.toDF().toDF("k", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = Merge.upsert(state, batch, "k").localCheckpoint(eager = true)
        ()
      }
      .start()
    try {
      in.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      in.addData((2L, "B"), (3L, "c")); q.processAllAvailable()
      in.addData((1L, "A2")); q.processAllAvailable()
    } finally q.stop()
    assert(state.as[(Long, String)].collect().toSet ===
      Set((1L, "A2"), (2L, "B"), (3L, "c")))
  }
}
