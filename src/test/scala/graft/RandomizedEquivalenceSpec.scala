package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Metamorphic equivalence on SEEDED random inputs: several operators claim
  * to be exactly equivalent to a simpler (slower) spelling — prefix-filtered
  * Jaccard vs the quadratic all-pairs join, distributed dup-groups vs driver
  * union-find, literal-fold IVF vs the broadcast-join fallback. The oracle
  * corpus and the hand-built fixtures pin those claims on FIXED shapes; this
  * suite re-derives them on random graphs/corpora/vectors (fixed seeds —
  * deterministic across runs) where degenerate shapes the fixtures missed
  * (singleton blocks, self-similar vocab, disconnected hubs, near-ties)
  * arise naturally.
  */
class RandomizedEquivalenceSpec extends SparkTestBase {
  import spark.implicits._

  test("ngramJaccardPairs == naive all-pairs on random corpora (3 seeds)") {
    for (seed <- Seq(7, 23, 99)) {
      val rnd = new scala.util.Random(seed)
      // skewed vocab (Zipf-ish via min of two uniforms) in 2 blocks so both
      // dense near-dup clusters and empty prefixes occur
      val docs = (1 to 40).map { i =>
        val n = 3 + rnd.nextInt(10)
        val words = Seq.fill(n)(
          s"w${math.min(rnd.nextInt(25), rnd.nextInt(25))}")
        (i.toLong, if (rnd.nextBoolean()) "a" else "b", words.mkString(" "))
      }.toDF("doc_id", "source", "text")
      val fast = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "source", 0.5)
        .select($"id1", $"id2", $"jacc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // the Bayardo frequency order must yield the identical pair set —
      // losslessness is order-independent
      val freq = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "source",
          0.5, frequencyOrdered = true)
        .select($"id1", $"id2", $"jacc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(freq === fast, s"seed $seed: frequency order changed the output")
      val sets = docs.select($"doc_id".as("id"), $"source".as("block"),
        array_distinct(transform(split($"text", " "),
          t => graft.expressions.TextExpressions.polyHash(t))).as("h"))
      val naive = sets.as("a").join(sets.as("b"),
          $"a.block" === $"b.block" && $"a.id" < $"b.id")
        .select($"a.id".as("id1"), $"b.id".as("id2"),
          graft.operators.TextOps.jaccard($"a.h", $"b.h").as("jacc"))
        .filter($"jacc" >= 0.5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast === naive, s"seed $seed: prefix filtering lost/added pairs")
    }
  }

  test("dupGroups distributed == driver union-find on random graphs (3 seeds)") {
    for (seed <- Seq(1, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      // mix of structures: random edges over 60 vertices plus a guaranteed
      // chain and a star so deep and wide components both appear
      val random = Seq.fill(50)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val chain = (70L until 80L).map(i => (i, i + 1))
      val star = (90L until 95L).map(i => (85L, i))
      val pairs = (random ++ chain ++ star).toDF("id1", "id2")
      val driver = Dedup.dupGroups(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.dupGroups(pairs, driverEdgeLimit = 0).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(driver === dist, s"seed $seed: branch divergence")
    }
  }

  test("knnIvfFrom literal == broadcast-join fallback on random vectors") {
    val rnd = new scala.util.Random(5)
    val emb = (0L until 120L).map(i =>
        (i, Array.fill(16)(rnd.nextGaussian()).toSeq))
      .toDF("vec_id", "embedding")
    val corpus = Similarity.prepared(emb, "embedding", "vec_id")
    val cents = corpus.filter($"id" < 6).collect()
      .map(r => Similarity.Cent(r.getLong(0), r.getSeq[Double](1).toArray,
        r.getDouble(2))).toSeq
    def run(limit: Long) =
      Similarity.knnIvfFrom(corpus, cents, Seq(3L, 50L, 99L), k = 4,
          nProbe = 3, literalLimit = limit)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    assert(run(Long.MaxValue) === run(0L))
  }
}
