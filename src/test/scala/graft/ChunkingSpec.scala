package graft

import graft.operators.TextOps

/** Window arithmetic of the sequence-chunking operator: overlap, short
  * tail, single-chunk and degenerate-length documents, hand-computed.
  */
class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunkDocuments: overlap windows and short tail, hand-computed") {
    // 13 tokens, size 5, stride 4 → raw starts 0,4,8,12 — but start 12 is a
    // redundant tail (12 − 4 + 5 ≥ 13: chunk 2 already reaches the document
    // end, so a 4th chunk "t13" would only duplicate covered tokens) and is
    // skipped
    val text = (1 to 13).map(i => s"t$i").mkString(" ")
    val got = TextOps.chunkDocuments(Seq((7L, text)).toDF("doc_id", "text"),
        "text", "doc_id", size = 5, stride = 4)
      .orderBy($"chunk_idx").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(got === Array(
      (0, "t1 t2 t3 t4 t5", 5),
      (1, "t5 t6 t7 t8 t9", 5),
      (2, "t9 t10 t11 t12 t13", 5)))
    // every token appears in at least one chunk; overlap = size - stride
    assert(got.flatMap(_._2.split(" ")).toSet === (1 to 13).map(i => s"t$i").toSet)
    // a genuinely new tail token IS kept: 14 tokens → start 12 adds t14
    val text14 = (1 to 14).map(i => s"t$i").mkString(" ")
    val tail = TextOps.chunkDocuments(Seq((8L, text14)).toDF("doc_id", "text"),
        "text", "doc_id", size = 5, stride = 4)
      .orderBy($"chunk_idx").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(tail.last === ((3, "t13 t14", 2)))
  }

  test("chunkDocuments: doc shorter than one window is a single chunk") {
    val got = TextOps.chunkDocuments(Seq((1L, "a b c")).toDF("doc_id", "text"),
        "text", "doc_id", size = 8, stride = 6).collect()
    assert(got.length === 1 && got.head.getString(2) === "a b c" &&
      got.head.getInt(3) === 3)
  }

  test("chunk invariants hold on 50 random docs (coverage, bounds, rebuild)") {
    val rnd = new scala.util.Random(11)
    val size = 7; val stride = 5
    val docs = (1L to 50L).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i, (0 until n).map(j => s"d${i}_$j").mkString(" "))
    }
    val chunks = TextOps.chunkDocuments(docs.toDF("doc_id", "text"),
        "text", "doc_id", size, stride)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((id, text) <- docs) {
      val toks = text.split(" ")
      val cs = chunks(id)
      // chunk_idx dense from 0; every chunk within size; n_tokens honest
      assert(cs.map(_._2).toSeq === cs.indices.toSeq)
      assert(cs.forall(c => c._4 >= 1 && c._4 <= size &&
        c._3.split(" ").length == c._4))
      // rebuild: first `stride` tokens of each chunk plus the final
      // chunk's tail reconstruct the document exactly
      val rebuilt = cs.flatMap(c => c._3.split(" ").take(stride)) ++
        cs.last._3.split(" ").drop(stride)
      assert(rebuilt.toSeq === toks.toSeq, s"doc $id rebuild mismatch")
    }
  }

  test("chunkDocuments rejects stride > size (would drop tokens)") {
    intercept[IllegalArgumentException](
      TextOps.chunkDocuments(Seq((1L, "a")).toDF("doc_id", "text"),
        "text", "doc_id", size = 4, stride = 5))
  }
}
