package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sq, Similarity}

/** Int8 scalar-quantization ANN: code correctness against a driver-side
  * re-derivation, range-training partition invariance, clamping/degenerate
  * edges, and the recall contract vs brute force. The oracle gate
  * (q_sim_knn_sq8) pins cross-engine agreement; this pins the operator's
  * own invariants.
  */
class SqSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private val queryIds = Seq(1L, 2L, 3L)

  test("codesFor matches a driver-side re-derivation and clamps to 0..255") {
    val vecs = Seq(
      (1L, Seq(0.0, 10.0, -3.0)),
      (2L, Seq(1.0, -10.0, 7.0)),
      (3L, Seq(0.25, 0.0, 2.0)),
      (4L, Seq(0.5, 5.0, 2.0))) // dim 2 shared max with id 3 (ties fine)
    val corpus = Similarity.prepared(
      vecs.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<double>").as("embedding")),
      "embedding", "vec_id")
    val r = Sq.trainRange(corpus)
    val got = corpus
      .select($"id", Sq.codesFor($"v", $"nrm", r).as("c"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1).toSeq).toMap
    // driver-side mirror of the same IEEE arithmetic
    val normed = vecs.map { case (id, v) =>
      val n = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
      id -> v.map(_ / n)
    }.toMap
    val dims = normed.values.head.indices
    val mins = dims.map(i => normed.values.map(_(i)).min)
    val maxs = dims.map(i => normed.values.map(_(i)).max)
    assert(r.mins.toSeq === mins && r.maxs.toSeq === maxs)
    for ((id, nv) <- normed) {
      val exp = dims.map { i =>
        if (maxs(i) == mins(i)) 0L
        else math.min(math.max(
          math.floor((nv(i) - mins(i)) * 255.0 / (maxs(i) - mins(i))).toLong,
          0L), 255L)
      }
      assert(got(id) === exp, s"id $id")
    }
    // every code in range, and each dim's max-holder lands at the top of
    // the scale — 254 or 255, not exactly 255: (mx−mn)·255/(mx−mn) can
    // round just BELOW 255 in IEEE, and the driver-side mirror above pins
    // whichever value the arithmetic actually produces
    assert(got.values.flatten.forall(c => c >= 0 && c <= 255))
    assert(dims.forall(i => got.values.map(_(i)).max >= 254L))
  }

  test("a constant dimension codes to 0 instead of dividing by zero") {
    // dim 0 is constant AFTER normalization: same first coordinate and
    // same norm (3-4-5 triangles with opposite second coordinates)
    val corpus = Similarity.prepared(
      Seq((1L, Seq(3.0, 4.0)), (2L, Seq(3.0, -4.0)))
        .toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<double>").as("embedding")),
      "embedding", "vec_id")
    val r = Sq.trainRange(corpus)
    assert(r.mins(0) === r.maxs(0)) // 3/5 both rows
    val codes = corpus.select(Sq.codesFor($"v", $"nrm", r).as("c"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(codes.forall(_(0) === 0L))
  }

  test("trainRange is partition-invariant and knnSq8 results don't depend " +
      "on layout") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id")
    val r1 = Sq.trainRange(corpus.repartition(1))
    val r17 = Sq.trainRange(corpus.repartition(17))
    assert(r1.mins.toSeq === r17.mins.toSeq)
    assert(r1.maxs.toSeq === r17.maxs.toSeq)
    val a = Sq.knnSq8(emb, "embedding", "vec_id", queryIds, 5)
      .orderBy($"query_id", $"neighbor_id").collect().toSeq
    val b = Sq.knnSq8(emb.repartition(13), "embedding", "vec_id", queryIds, 5)
      .orderBy($"query_id", $"neighbor_id").collect().toSeq
    assert(a === b)
  }

  test("knnSq8 returns k rows per query with near-exact recall at 8 bits") {
    val k = 5
    val sq = Sq.knnSq8(emb, "embedding", "vec_id", queryIds, k).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    val brute = Similarity.knnBrute(emb, "embedding", "vec_id", queryIds, k)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    assert(sq.keySet === queryIds.toSet)
    assert(sq.values.forall(_.size === k))
    // 8-bit codes over 64 normalized dims lose almost nothing: demand the
    // recall floor that separates "quantization noise" from "broken metric"
    val recall = queryIds.map(q =>
      sq(q).intersect(brute(q)).size.toDouble / k).sum / queryIds.size
    assert(recall >= 0.8, s"recall $recall")
  }
}
