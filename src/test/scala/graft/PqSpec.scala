package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** Product-quantization ANN: encoding correctness against a driver-side
  * re-derivation, codebook-training determinism, the ADC/rerank recall
  * contract vs brute force, and the literal-size guard. The oracle gates
  * (q_sim_knn_pq / q_sim_knn_pq_rerank) pin cross-engine agreement; this
  * pins the operator's own invariants.
  */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private val queryIds = Seq(1L, 2L, 3L)

  test("codesFor matches a driver-side argmin re-derivation") {
    // 2 subspaces × 3 centroids over dim 4: small enough to enumerate.
    val cbs: Seq[Seq[Array[Double]]] = Seq(
      Seq(Array(0.0, 0.0), Array(1.0, 1.0), Array(-1.0, 2.0)),
      Seq(Array(2.0, 2.0), Array(0.0, -1.0), Array(0.5, 0.5)))
    val vecs = Seq(
      (1L, Seq(0.9, 1.1, 0.4, 0.6)),
      (2L, Seq(-0.8, 1.7, 2.0, 1.9)),
      (3L, Seq(0.0, 0.0, 0.0, -1.0)),
      // exactly equidistant to centroids 0 and 1 in subspace 0 — the
      // strict-< fold must keep the SMALLEST cid on ties
      (4L, Seq(0.5, 0.5, 0.0, 0.0)))
    def expected(v: Seq[Double]): Seq[Int] =
      cbs.zipWithIndex.map { case (cb, s) =>
        val sub = v.slice(s * 2, s * 2 + 2)
        cb.zipWithIndex.map { case (c, ci) =>
          (c.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum, ci)
        }.minBy(identity)._2
      }
    val got = vecs.toDF("id", "v")
      .select($"id", Pq.codesFor($"v", cbs).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    for ((id, v) <- vecs) assert(got(id) === expected(v), s"id $id")
    assert(got(4L).head === 0, "tie must keep the smallest cid")
  }

  test("trainCodebooks is deterministic and partition-invariant") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id").persist()
    try {
      val a = Pq.trainCodebooks(corpus, m = 4, k = 8, lloydIters = 2)
      val b = Pq.trainCodebooks(corpus.repartition(13), m = 4, k = 8,
        lloydIters = 2)
      assert(a.size === 4)
      assert(a.forall(_.size === 8))
      assert(a.map(_.map(_.toSeq)) === b.map(_.map(_.toSeq)))
    } finally corpus.unpersist()
  }

  test("knnPqAdc returns k rows per query; rerank repairs recall") {
    val k = 5
    val brute = Similarity.knnBrute(emb, "embedding", "vec_id", queryIds, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Array[(Long, Long)]): Double =
      rows.count(brute.contains).toDouble / brute.size
    val adc = Pq.knnPqAdc(emb, "embedding", "vec_id", queryIds, k,
        m = 4, numCents = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rr = Pq.knnPqAdc(emb, "embedding", "vec_id", queryIds, k,
        m = 4, numCents = 8, rerank = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (rows <- Seq(adc, rr)) {
      val byQuery = rows.groupBy(_._1)
      assert(byQuery.keySet === queryIds.toSet)
      assert(byQuery.values.forall(_.length === k))
    }
    // Exact re-ranking of a candidate superset (top-15 ADC ⊇ top-5 ADC)
    // can reorder but never finds FEWER true neighbors than trusting the
    // quantized distances outright on this deterministic corpus.
    assert(recall(rr) >= recall(adc),
      s"rerank recall ${recall(rr)} < pure-ADC recall ${recall(adc)}")
    // both must be non-trivial on a 16k-doc corpus with 8^4 distinct codes
    assert(recall(adc) > 0.0)
  }

  test("empty corpus trains empty codebooks and knnPqFrom short-circuits") {
    val empty = Similarity.prepared(emb, "embedding", "vec_id")
      .filter(lit(false))
    assert(Pq.trainCodebooks(empty, m = 4, k = 8, lloydIters = 1).isEmpty)
    val out = Pq.knnPqFrom(empty, Seq.empty, queryIds, k = 5)
    assert(out.columns.toSeq === Seq("query_id", "neighbor_id", "adc_dist"))
    assert(out.count() === 0)
  }

  test("rerank below k is rejected") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id")
    val cbs = Seq.fill(4)(Seq.fill(2)(new Array[Double](16)))
    intercept[IllegalArgumentException](
      Pq.knnPqFrom(corpus, cbs, queryIds, k = 5, rerank = 3))
  }

  test("codebook literal guard fires before planting an oversized literal") {
    // 4 subspaces × 2048 centroids × 1024 dims ≈ 8.4M doubles > 2^22
    val huge = Seq.fill(4)(Seq.fill(2048)(new Array[Double](1024)))
    val corpus = Similarity.prepared(emb, "embedding", "vec_id")
    intercept[IllegalArgumentException](
      Pq.knnPqFrom(corpus, huge, queryIds, k = 5))
  }

  test("IVF-PQ with full probe + full re-rank degenerates to brute force") {
    // nProbe = |cells| probes every cell (every corpus row is a candidate)
    // and rerank >= |corpus| re-scores them all exactly — the composed
    // approximation must then vanish entirely
    val corpus = Similarity.prepared(emb, "embedding", "vec_id")
      .persist()
    val k = 5
    val (cents, cbs) = graft.operators.Ivfpq.train(corpus, nCells = 4,
      m = 4, kSub = 4, lloydIters = 1)
    val got = graft.operators.Ivfpq.knnIvfPqFrom(corpus, cents, cbs,
        queryIds, k, nProbe = cents.size, rerank = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.knnBrute(emb, "embedding", "vec_id", queryIds, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    corpus.unpersist()
    assert(got === brute)
  }

  test("IVF-PQ on an empty corpus short-circuits to an empty result") {
    val empty = Similarity.prepared(emb, "embedding", "vec_id")
      .filter(lit(false))
    val (cents, cbs) = graft.operators.Ivfpq.train(empty, 4, 4, 4, 1)
    assert(cents.isEmpty && cbs.isEmpty)
    val out = graft.operators.Ivfpq.knnIvfPqFrom(empty, cents, cbs,
      queryIds, k = 5, nProbe = 1, rerank = 5)
    assert(out.columns.toSeq === Seq("query_id", "neighbor_id", "cosine"))
    assert(out.count() === 0)
  }

  test("rerank breadth schedules: the gate fraction vs the sublinear " +
      "production schedule") {
    import graft.operators.Pq
    // the gate fraction: ceil(2n/5), floored at k
    assert(Pq.rerankBreadth(2000, 10) === 800)
    assert(Pq.rerankBreadth(4, 10) === 10)
    // the production schedule: max(8k, ceil(sqrt(n))) — sublinear, so it
    // becomes a vanishing fraction of a growing corpus while the gate
    // fraction stays 40% forever
    assert(Pq.rerankBreadthSublinear(100, 10) === 80) // 8k floor
    assert(Pq.rerankBreadthSublinear(1000000, 10) === 1000) // sqrt regime
    assert(Pq.rerankBreadthSublinear(0, 3) === 24)
    val n = 100000000L
    assert(Pq.rerankBreadthSublinear(n, 10).toDouble / n <
      Pq.rerankBreadth(n, 10).toDouble / n / 100,
      "sublinear must be >=100x below the gate fraction at 1e8 rows")
  }
}
