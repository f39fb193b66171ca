package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Edge semantics of the dedup operators beyond what the oracle corpus
  * exercises: null/short documents, pair ordering, known-graph clustering.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  test("minhash signatures skip null and sub-k documents") {
    val df = Seq((1L, "a b c d e"), (2L, "a b"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(df, "text", "doc_id", k = 3)
    assert(sig.select($"id").as[Long].collect().toSeq === Seq(1L))
    assert(sig.select(size($"m")).head.getInt(0) === 16)
  }

  test("dup pairs are ordered id1 < id2 and identical docs verify at 1.0") {
    val df = Seq(
        (10L, "the quick brown fox jumps over the dog"),
        (7L, "the quick brown fox jumps over the dog"),
        (3L, "completely different words entirely here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashDupPairs(df, "text", "doc_id", 3, 0.8).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    val dup = pairs.find(r => r.getLong(0) == 7L && r.getLong(1) == 10L)
    assert(dup.isDefined && dup.get.getAs[Double]("jacc") === 1.0 &&
      dup.get.getAs[Boolean]("is_dup"))
  }

  test("dupGroups resolves chains and keeps the min id per component") {
    // components: {1,2,3,4} via chain, {10,11} isolated pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id1", "id2")
    val groups = Dedup.dupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("dupGroups handles a long chain within maxIter via pointer jumping") {
    val n = 40
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id1", "id2")
    val groups = Dedup.dupGroups(pairs, maxIter = 10).collect()
    assert(groups.length === n)
    assert(groups.forall(_.getLong(1) === 1L),
      groups.sortBy(_.getLong(0)).map(r => s"${r.getLong(0)}->${r.getLong(1)}")
        .mkString(","))
  }

  test("exactGroups counts copies and keeps the min id") {
    val df = Seq((5L, "same"), (2L, "same"), (9L, "other"))
      .toDF("doc_id", "text")
    val g = Dedup.exactGroups(df, "text", "doc_id").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(g === Map(2L -> 2L, 9L -> 1L))
  }
}
