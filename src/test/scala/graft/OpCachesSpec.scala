package graft

import org.apache.spark.sql.functions._
import graft.operators.OpCaches

/** The bounded registry for operator-internal multi-consumer persists
  * (r20): registration semantics, the bench's per-sample cold hook, and
  * the LRU lifetime bound that keeps a long-lived session from pinning
  * frames forever (the r19 verdict/ADVICE item the registry exists for).
  */
class OpCachesSpec extends SparkTestBase {
  import spark.implicits._

  private def freshFrame(tag: Int) =
    (1 to 100).map(i => (i.toLong, i * tag)).toDF("id", s"v")
      .filter(col("id") > lit(tag)) // distinct plan per tag

  test("cached() persists, same-plan re-registration returns the live " +
      "frame (hit), and clear() unpersists everything") {
    OpCaches.clear()
    val h0 = OpCaches.hits.get()
    val a = OpCaches.cached(freshFrame(1))
    assert(a.storageLevel.useMemory, "cached() must persist the frame")
    assert(OpCaches.frameCount >= 1)
    // same analyzed plan → the registered frame is served, counted as hit
    val b = OpCaches.cached(freshFrame(1))
    assert(b eq a, "same-plan registration must return the live frame")
    assert(OpCaches.hits.get() === h0 + 1)
    OpCaches.clear()
    assert(OpCaches.frameCount === 0)
    assert(a.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "clear() must unpersist registered frames (the bench cold-sample " +
        "hook: a timed sample may never read a warmup-built cache)")
    // correctness is unaffected: the unpersisted plan lazily recomputes
    assert(b.count() === 99)
  }

  test("LRU bound: registering more frames than the cap evicts the " +
      "eldest instead of accumulating pinned storage") {
    OpCaches.clear()
    val first = OpCaches.cached(freshFrame(101))
    (102 to 115).foreach(t => OpCaches.cached(freshFrame(t)))
    assert(OpCaches.frameCount <= 8,
      s"registry must stay bounded, got ${OpCaches.frameCount}")
    assert(first.storageLevel ===
      org.apache.spark.storage.StorageLevel.NONE,
      "the eldest frame must have been unpersisted on overflow")
    OpCaches.clear()
  }

  test("a query path through the registry computes identical results " +
      "cold and warm (eviction is never a correctness event)") {
    OpCaches.clear()
    val input = (1 to 50).map(i => ("g" + (i % 3), i.toLong))
      .toDF("g", "v")
    def q() = graft.operators.Positional.groupedPrefixSum(
      input, Seq("g"), Seq(col("v")), col("v"), "run")
      .orderBy(col("g"), col("v")).collect().toSeq
    val cold = q()
    val warm = q()
    OpCaches.clear()
    val coldAgain = q()
    assert(cold === warm && warm === coldAgain)
    OpCaches.clear()
  }
}
