package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Learned-centroid IVF path: deterministic k-means|| centroids and the
  * recall contract vs brute force. The oracle gate keeps the seed-centroid
  * spelling (cross-engine reproducible); this pins the production path.
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private val queryIds = Seq(1L, 2L, 3L)

  test("kmeansCentroids is deterministic and returns k centroids") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id")
      .persist()
    val c1 = Similarity.kmeansCentroids(corpus, k = 8, lloydIters = 2)
      .orderBy($"cid").collect()
    val c2 = Similarity.kmeansCentroids(corpus, k = 8, lloydIters = 2)
      .orderBy($"cid").collect()
    assert(c1.length === 8)
    assert(c1.map(_.getSeq[Double](1)).toSeq ===
      c2.map(_.getSeq[Double](1)).toSeq)
    corpus.unpersist()
  }

  test("kmeansCentroidsSeq Lloyd dispatch (r15 verdict item 2): below " +
      "LloydBucketedMinK the default equals the forced-flat hook bitwise; " +
      "at the threshold the bucketed default kicks in (differs from flat " +
      "on this corpus), is deterministic, and is layout-invariant") {
    def key(cs: Seq[Similarity.Cent]) =
      cs.map(c => (c.cid, c.cv.toSeq, c.cnrm))
    val corpus = Similarity.prepared(emb, "embedding", "vec_id").persist()
    try {
      val below = Similarity.LloydBucketedMinK - 1
      assert(key(Similarity.kmeansCentroidsSeq(corpus, below, 1)) ===
        key(Similarity.kmeansCentroidsSeqFlat(corpus, below, 1)))
      val k = Similarity.LloydBucketedMinK
      val a = key(Similarity.kmeansCentroidsSeq(corpus.repartition(3), k, 1))
      val b = key(Similarity.kmeansCentroidsSeq(corpus.repartition(7), k, 1))
      assert(a.length === k)
      assert(a === b) // partition count is an execution detail
      // the default at k >= threshold really is the two-level rule: on
      // this corpus the 4-probe assignment diverges from the flat argmax
      // for some rows, so the Lloyd means must differ (if a change ever
      // silently re-flattened the default, this catches it)
      assert(a !== key(Similarity.kmeansCentroidsSeqFlat(corpus, k, 1)))
    } finally { corpus.unpersist(); () }
  }

  test("k >= LloydBucketedMinK training PROVABLY runs the bucketed " +
      "assignment in every Lloyd round (the q_sim_knn_ivf_learned_k64 " +
      "gate's definition-of-done — counter, not dispatch-expression " +
      "trust; r16 verdict item 1)") {
    // exact-delta assertions assume no OTHER caller of assignCellsBucketed
    // runs concurrently in this JVM — suites here execute serially
    // (ScalaTest default, no parallelExecution override in build.sbt)
    val corpus = Similarity.prepared(emb, "embedding", "vec_id").persist()
    try {
      val lloydIters = 2 // the k64 gate's training depth
      val before = Similarity.bucketedAssignCalls.get()
      Similarity.kmeansCentroidsSeq(corpus, Similarity.LloydBucketedMinK,
        lloydIters)
      assert(Similarity.bucketedAssignCalls.get() - before ===
        lloydIters.toLong,
        "expected exactly one bucketed-assignment invocation per Lloyd round")
      // the forced-flat probe hook must never touch the bucketed rule
      val b2 = Similarity.bucketedAssignCalls.get()
      Similarity.kmeansCentroidsSeqFlat(corpus,
        Similarity.LloydBucketedMinK, 1)
      assert(Similarity.bucketedAssignCalls.get() === b2)
      // and below the threshold the default stays flat
      Similarity.kmeansCentroidsSeq(corpus,
        Similarity.LloydBucketedMinK - 1, 1)
      assert(Similarity.bucketedAssignCalls.get() === b2)
    } finally { corpus.unpersist(); () }
  }

  test("knnIvfLearned returns k neighbors per query with sane recall") {
    val k = 5
    val brute = Similarity.knnBrute(emb, "embedding", "vec_id", queryIds, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val learned = Similarity.knnIvfLearned(emb, "embedding", "vec_id",
        queryIds, k, numCentroids = 4, lloydIters = 2)
      .collect()
    val byQuery = learned.groupBy(_.getLong(0))
    assert(byQuery.keySet === queryIds.toSet)
    assert(byQuery.values.forall(_.length <= k))
    // IVF probes one cell — recall is approximate; demand a nontrivial
    // overlap with brute force rather than exactness
    val hits = learned.map(r => (r.getLong(0), r.getLong(1)))
      .count(brute.contains)
    assert(hits >= queryIds.length,
      s"expected >= ${queryIds.length} brute-force hits, got $hits")
  }

  test("lshBucket fails fast on a plane matrix too large to inline") {
    // 64 planes × 70k dims ≈ 4.5M doubles > the 2^22 literal guard — must
    // raise instead of silently planting a 36 MB literal in the plan
    val huge = Seq.fill(64)(new Array[Double](70000))
    intercept[IllegalArgumentException](
      Similarity.lshBucket(lit(0), huge))
  }

  test("lshBucket literal-fold matches the per-plane spelling") {
    // independent re-derivation of the bucket id for a known vector
    val ps = Similarity.planes(numPlanes = 6, dim = 8)
    val v = Array.tabulate(8)(i => (i - 3).toDouble / 2.0)
    val expected = ps.zipWithIndex.map { case (w, p) =>
      if (w.zip(v).map { case (a, b) => a * b }.sum > 0) 1L << p else 0L
    }.sum
    val got = Seq(Tuple1(v.toSeq)).toDF("v")
      .select(Similarity.lshBucket($"v", ps).as("b")).head().getLong(0)
    assert(got === expected)
  }

  private def seedCents(n: Int): Seq[Similarity.Cent] =
    Similarity.prepared(emb, "embedding", "vec_id")
      .filter($"id" < n).collect()
      .map(r => Similarity.Cent(r.getLong(0), r.getSeq[Double](1).toArray,
        r.getDouble(2))).toSeq

  test("assignCells broadcast-join fallback equals the literal fold") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id")
    val cents = seedCents(4)
    def cells(limit: Long) =
      Similarity.assignCells(corpus, cents, literalLimit = limit)
        .select($"id", $"cell").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(cells(Long.MaxValue) === cells(0L))
  }

  test("assignCellsBucketed at full probe equals the flat fold (the " +
      "approximation vanishes, same contract as nProbe=|cells| == brute)") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id").persist()
    try {
      for (k <- Seq(4, 8, 16)) {
        val cents = Similarity.kmeansCentroidsSeq(corpus, k, lloydIters = 2)
        val m = Similarity.centroidGroupCount(cents.size)
        val flat = Similarity.assignCells(corpus, cents)
          .select($"id", $"cell").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        val full = Similarity.assignCellsBucketed(corpus, cents,
            nProbe = m)
          .select($"id", $"cell").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(full === flat, s"k=$k full-probe != flat")
      }
    } finally corpus.unpersist()
  }

  test("assignCellsBucketed: in-memory replica parity of the two-level " +
      "rule at partial probe, across seeds and degenerate rows") {
    def dotA(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cosA(a: Array[Double], na: Double, b: Array[Double],
        nb: Double): Double =
      if (na * nb > 0) dotA(a, b) / (na * nb) else 0.0
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val dim = 6
      // 60 rows incl. an all-zero row and an exact duplicate pair —
      // cosine guard + tie-break coverage
      val rows = (0L until 58L).map(i =>
          (i, Array.fill(dim)(rnd.nextDouble() * 2 - 1))) ++
        Seq((58L, new Array[Double](dim)),
          (59L, Array.fill(dim)(0.5)))
      val dup = rows.take(1).map { case (_, v) => (60L, v.clone()) }
      val all = rows ++ dup
      val corpus = Similarity.prepared(
        all.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding"),
        "embedding", "vec_id")
      val cents = all.take(12).map { case (i, v) =>
        Similarity.Cent(i, v, math.sqrt(dotA(v, v))) }.toSeq
      val (groups, cid2gid) = Similarity.groupCentroids(cents, 5)
      val p = 2
      val got = Similarity.assignCellsGrouped(corpus, cents, groups,
          cid2gid, nProbe = p)
        .select($"id", $"cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byGid = cents.groupBy(c => cid2gid(c.cid))
      val want = all.map { case (id, v) =>
        val nv = math.sqrt(dotA(v, v))
        val probed = groups
          .map(g => (cosA(v, nv, g.gv, g.gn), g.gid))
          .map { case (c, g) => (if (c == 0.0) 0.0 else c, g) } // -0.0 → 0.0
          .sortBy { case (c, g) => (-c, g) }
          .take(p).map(_._2)
        var best = Double.NegativeInfinity; var bcid = -1L
        for (g <- probed; c <- byGid(g)) {
          val cs = cosA(v, nv, c.cv, c.cnrm)
          if (cs > best || (cs == best && c.cid < bcid)) {
            best = cs; bcid = c.cid
          }
        }
        id -> bcid
      }.toMap
      assert(got === want, s"seed=$seed two-level replica mismatch")
    }
  }

  test("bucketed-assignment fidelity ladder: agreement with the flat " +
      "argmax is monotone in nProbe and exact at full probe (the " +
      "assignment analog of the nProbe recall ladder)") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id").persist()
    try {
      val cents = Similarity.kmeansCentroidsSeq(corpus, 16, lloydIters = 2)
      val (groups, cid2gid) = Similarity.groupCentroids(cents,
        Similarity.centroidGroupCount(cents.size))
      val m = groups.size
      val flat = Similarity.assignCells(corpus, cents)
        .select($"id", $"cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val agree = (1 to m).map { p =>
        val b = Similarity.assignCellsGrouped(corpus, cents, groups,
            cid2gid, nProbe = p)
          .select($"id", $"cell").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        p -> b.count { case (id, c) => flat(id) == c }.toDouble / flat.size
      }
      for (Seq((pa, aa), (pb, ab)) <- agree.sliding(2))
        assert(ab >= aa, s"fidelity not monotone: p=$pa $aa -> p=$pb $ab")
      assert(agree.last._2 === 1.0, s"full probe must equal flat: $agree")
      // the default operating point keeps a useful majority even on this
      // near-uniform corpus (real clustered embeddings sit far higher)
      val atDefault = agree
        .find(_._1 == math.min(Similarity.GroupProbes, m)).get._2
      assert(atDefault >= 0.5, s"default-probe fidelity $atDefault")
    } finally corpus.unpersist()
  }

  test("assignCellsGrouped joined fallback equals the literal fold at " +
      "partial AND full probe (the over-literal-budget 100 TB path)") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id").persist()
    try {
      val cents = Similarity.kmeansCentroidsSeq(corpus, 12, lloydIters = 2)
      val (groups, cid2gid) = Similarity.groupCentroids(cents, 4)
      for (p <- Seq(1, 2, 4)) {
        def cells(limit: Long) =
          Similarity.assignCellsGrouped(corpus, cents, groups, cid2gid,
              nProbe = p, literalLimit = limit)
            .select($"id", $"cell").collect()
            .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(cells(Long.MaxValue) === cells(0L), s"nProbe=$p")
      }
      // degenerate contract parity: empty centroid set -> every cell -1
      // on BOTH spellings
      val viaJoined = Similarity.assignCellsGroupedJoined(corpus,
          Seq.empty, Seq.empty, Map.empty)
        .select($"cell").distinct().collect().map(_.getLong(0)).toSeq
      assert(viaJoined === Seq(-1L))
    } finally corpus.unpersist()
  }

  test("groupCentroids: deterministic, every cid mapped, gids are " +
      "non-empty groups") {
    val cents = seedCents(8)
    val (g1, m1) = Similarity.groupCentroids(cents, 3)
    val (g2, m2) = Similarity.groupCentroids(cents, 3)
    assert(g1.map(g => (g.gid, g.gv.toSeq, g.gn)) ===
      g2.map(g => (g.gid, g.gv.toSeq, g.gn)))
    assert(m1 === m2)
    assert(m1.keySet === cents.map(_.cid).toSet)
    assert(m1.values.toSet === g1.map(_.gid).toSet,
      "every group non-empty, every assignment points at a real group")
    // empty centroid set: no groups, no mapping, and assignment degrades
    // to the flat fold's empty behavior (cell = -1)
    val (ge, me) = Similarity.groupCentroids(Seq.empty, 3)
    assert(ge.isEmpty && me.isEmpty)
  }

  test("semDedupAuto model: replayable grouping, one decision per row, " +
      "cells are real cids") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id").persist()
    try {
      val n = corpus.count()
      val model = Similarity.semDedupAuto(corpus, 0.3, targetCellSize = 60L)
      val dec = model.decisions.collect()
      assert(dec.length === n)
      val cids = model.cents.map(_.cid).toSet
      assert(dec.forall(r => cids.contains(r.getLong(1))),
        "every assigned cell is a learned centroid id")
      assert(model.cidToGid.keySet === cids)
      assert(model.cidToGid.values.toSet === model.groups.map(_.gid).toSet)
      assert(dec.forall(r =>
        r.getBoolean(3) === (r.getLong(2) === r.getLong(0))))
      // decisions replay exactly from the model's own pieces: the same
      // grouped assignment feeding the same pair/component fold
      val replay = Similarity.assignCellsGrouped(corpus, model.cents,
          model.groups, model.cidToGid, model.nProbe)
        .select($"id", $"cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dec.map(r => r.getLong(0) -> r.getLong(1)).toMap === replay)
    } finally corpus.unpersist()
  }

  test("knnIvfFrom broadcast-join fallback equals the literal path") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id")
    val cents = seedCents(4)
    def run(limit: Long) =
      Similarity.knnIvfFrom(corpus, cents, queryIds, k = 5, nProbe = 2,
          literalLimit = limit)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    assert(run(Long.MaxValue) === run(0L))
  }

  test("withBuckets broadcast-join fallback equals the literal fold") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id")
    val ps = Similarity.planes(numPlanes = 6, dim = 64)
    def buckets(limit: Long) =
      Similarity.withBuckets(corpus, ps, literalLimit = limit)
        .select($"id", $"bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(buckets(Long.MaxValue) === buckets(0L))
  }

  test("nProbe recall ladder: monotone, and nProbe=|cells| == brute force") {
    val k = 5
    val nc = 4
    def hitsAt(p: Int): (Int, Set[(Long, Long)]) = {
      val got = Similarity.knnIvf(emb, "embedding", "vec_id", queryIds, k,
          numCentroids = nc, nProbe = p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got.size, got)
    }
    val brute = Similarity.knnBrute(emb, "embedding", "vec_id", queryIds, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (_, p1) = hitsAt(1)
    val (_, p2) = hitsAt(2)
    val (_, pAll) = hitsAt(nc)
    // probing every cell is exhaustive search — must equal brute force
    assert(pAll === brute)
    // more probes never lose recall
    assert((p1 & brute).size <= (p2 & brute).size)
    assert((p2 & brute).size <= (pAll & brute).size)
  }

  test("IVF cell assignment never collapses into a mega-cell") {
    // The IVF scale property that matters at corpus scale: a centroid set
    // whose assignment funnels most vectors into one cell recreates the
    // skew failure IVF exists to avoid (one task scans ~everything, and a
    // probe of that cell is brute force in disguise). Pin cell-count and
    // bounded imbalance for BOTH centroid sources on the gate corpus; the
    // values are deterministic per dataset. (Recall quality is the
    // 40-query panel's business — see recallVsBrute; on that panel the
    // learned centroids out-recall the seed heuristic at equal probe
    // breadth, 0.705 vs 0.580 at nProbe=3.)
    val corpus = Similarity.prepared(emb, "embedding", "vec_id").persist()
    try {
      val seed = corpus.filter($"id" < 8).collect()
        .map(r => Similarity.Cent(r.getLong(0), r.getSeq[Double](1).toArray,
          r.getDouble(2))).toSeq
      val learned = Similarity.kmeansCentroidsSeq(corpus, k = 8,
        lloydIters = 3)
      for ((nm, cents) <- Seq("seed" -> seed, "learned" -> learned)) {
        val sizes = Similarity.assignCells(corpus, cents)
          .groupBy($"cell").count().collect().map(_.getLong(1)).sorted
        assert(sizes.length === 8, s"$nm: empty cells: ${sizes.toSeq}")
        assert(sizes.last <= 2 * sizes.head,
          s"$nm cells skewed: ${sizes.toSeq}")
      }
    } finally corpus.unpersist()
  }

  test("semDedupDecisions: one decision per row; threshold edges collapse " +
      "to per-cell components / identity") {
    val corpus = Similarity.prepared(emb, "embedding", "vec_id").persist()
    try {
      val cents = Similarity.kmeansCentroidsSeq(corpus, k = 4, lloydIters = 1)
      val n = corpus.count()
      // threshold above any cosine → no pairs → every row keeps itself
      val all = Similarity.semDedupDecisions(corpus, cents, 1.1).collect()
      assert(all.length === n)
      assert(all.forall(r => r.getLong(2) === r.getLong(0) && r.getBoolean(3)))
      // threshold below any cosine → each cell is ONE component → exactly
      // one keeper per non-empty cell, and the keeper is the cell's min id
      val one = Similarity.semDedupDecisions(corpus, cents, -1.1).collect()
      assert(one.length === n)
      val byCell = one.groupBy(_.getLong(1))
      for ((cell, rows) <- byCell) {
        val minId = rows.map(_.getLong(0)).min
        assert(rows.forall(_.getLong(2) === minId), s"cell $cell keeper")
        assert(rows.count(_.getBoolean(3)) === 1, s"cell $cell keep count")
      }
      // mid threshold: keep ⇔ keeper == id, keepers are real row ids
      val mid = Similarity.semDedupDecisions(corpus, cents, 0.3).collect()
      val ids = mid.map(_.getLong(0)).toSet
      assert(mid.forall(r => r.getBoolean(3) === (r.getLong(2) === r.getLong(0))))
      assert(mid.forall(r => ids.contains(r.getLong(2))))
    } finally corpus.unpersist()
  }

  test("recallVsBrute (the bench queries_recall source): the recall ladder " +
      "holds with floors at the oracle gate scale") {
    // Every input is deterministic (hash planes, seed/k-means centroids,
    // the fixed 40-query RecallPanel), so these are exact per-dataset
    // constants, and the floors are real bars, not statistics. The panel
    // matters: 4-query recall has 0.05 granularity and r12 measured random
    // centroid placement alone moving it 0.00–0.65 on this corpus; 40
    // queries × k=5 = 200 pairs puts the noise well under the floor gaps.
    // The ladder:
    //   brute = 1  ≥  sq8 (full scan, quantized metric)  ≥  every
    //   pruning-based ANN  >  0, with each ANN gate ≥ 0.3 — an ANN
    //   configuration that cannot find a third of the true top-k on its
    //   own corpus is a broken operating point, not a tradeoff (that was
    //   r11's single-table LSH: recall 0.0).
    // The synthetic corpus is weakly clustered (true-neighbor cosines
    // 0.35-0.48), so these floors demand honest candidate breadth:
    // multi-table OR-construction for lsh, 9-bit/Hamming<=3 probing for
    // lsh_mp, 3-of-8-cell probing for both IVF gates, fractional
    // ceil(2n/5)-wide exact re-rank for pq_rerank and ivfpq (panel
    // recall 0.44-0.90 across gates/scales).
    val rec = graft.queries.Similarity.recallVsBrute(spark,
      "/root/testdata/sf0.01",
      annNames = Seq("q_sim_knn_brute", "q_sim_knn_lsh", "q_sim_knn_lsh_mp",
        "q_sim_knn_ivf", "q_sim_knn_ivf_learned",
        "q_sim_knn_ivf_learned_k64", "q_sim_knn_sq8",
        "q_sim_knn_pq", "q_sim_knn_pq_rerank", "q_sim_knn_pq_prod",
        "q_sim_knn_ivfpq", "q_sim_knn_matryoshka"))
    assert(rec("q_sim_knn_brute") === 1.0)
    assert(rec.values.forall(v => v >= 0.0 && v <= 1.0))
    for (ann <- Seq("q_sim_knn_lsh", "q_sim_knn_lsh_mp", "q_sim_knn_ivf",
        "q_sim_knn_ivf_learned", "q_sim_knn_pq_rerank", "q_sim_knn_ivfpq",
        "q_sim_knn_matryoshka"))
      assert(rec(ann) >= 0.3, s"$ann below the 0.3 recall floor: $rec")
    // Per-gate floors pinned at the r13 operating points (measured
    // sf0.01: lsh 0.455, lsh_mp 0.525, ivf 0.580, learned 0.705, ivfpq
    // 0.815, pq_rerank 0.840; small margin for testdata regeneration).
    // r12 shipped a 16-point silent ivf drop (0.65 → 0.49) and an
    // lsh_mp < lsh inversion precisely because only the 0.3 floor
    // existed — recall regressions must fail a spec, not ride into the
    // round artifact.
    val floors = Seq("q_sim_knn_lsh" -> 0.40, "q_sim_knn_lsh_mp" -> 0.48,
      "q_sim_knn_ivf" -> 0.55, "q_sim_knn_ivf_learned" -> 0.65,
      "q_sim_knn_ivfpq" -> 0.75, "q_sim_knn_pq_rerank" -> 0.75,
      // r17: shortlist floor 8k -> 16k lifted the small-corpus point
      // 0.775 -> 0.890 (the floor only binds below n=1600, so sf0.1+
      // operating points are unchanged — see MatShortlistMin's scaladoc);
      // r18: prefix width 32 -> 40 (the sweep's recall-per-byte knee,
      // see MatPrefixDim's scaladoc) lifted it again — floor re-pinned
      "q_sim_knn_matryoshka" -> 0.85,
      // the two r17 production-path gates (measured sf0.01: k64 0.740 —
      // 16-of-64-cell probing out-recalls the 8-cell gates at equal
      // ~25% scan; pq_prod 0.900 — the m=16/32-cent codebook's ADC
      // ordering is good enough that the SUBLINEAR max(8k, ceil sqrt n)
      // re-rank repairs it fully, the rerankBreadthSublinear
      // precondition made into a bar)
      "q_sim_knn_ivf_learned_k64" -> 0.65, "q_sim_knn_pq_prod" -> 0.80)
    for ((ann, floor) <- floors)
      assert(rec(ann) >= floor, s"$ann below its $floor pinned floor: $rec")
    // the production PQ point must dominate coarse ADC-alone by an order
    // of magnitude — it exists because codebook fidelity plus a sublinear
    // repair beats breadth (the coarse gate needs a 40%-of-corpus pass)
    assert(rec("q_sim_knn_pq_prod") > rec("q_sim_knn_pq"),
      s"production PQ below coarse ADC: $rec")
    // Multi-probe exists to buy multi-table recall without storing L
    // index copies; at the gates' equal ~25% expected candidate scan a
    // multi-probe that loses to the table gate is a mis-sized operating
    // point, never a tradeoff (r12 shipped exactly that: 0.40 vs 0.445).
    assert(rec("q_sim_knn_lsh_mp") >= rec("q_sim_knn_lsh"),
      s"multi-probe LSH below the multi-table gate: $rec")
    // the IVF-PQ composite must out-recall the plain-IVF gates it extends
    // (it probes one more cell and re-ranks exactly; if the residual ADC
    // ordering ever degrades enough to lose that edge, the operating
    // point is broken)
    assert(rec("q_sim_knn_ivfpq") >= rec("q_sim_knn_ivf_learned"),
      s"IVF-PQ below plain learned IVF: $rec")
    // pure ADC is the deliberately-coarse memory-compression rung; its only
    // bars are "nonzero" and "the re-rank repairs it" (the pair's point)
    assert(rec("q_sim_knn_pq") > 0.0, rec.toString)
    assert(rec("q_sim_knn_pq_rerank") > rec("q_sim_knn_pq"),
      s"exact re-rank did not repair ADC recall: $rec")
    // 8-bit scalar quantization on 64 normalized dims loses almost
    // nothing: near-exact by construction, and it must dominate every
    // pruning-based ANN (it scans the full corpus, only the metric is
    // quantized)
    assert(rec("q_sim_knn_sq8") >= 0.8, rec.toString)
    // (pq_rerank is excluded: its exact re-rank over a wide candidate set
    // can legitimately out-recall sq8's quantized full scan)
    for (ann <- Seq("q_sim_knn_lsh", "q_sim_knn_lsh_mp", "q_sim_knn_ivf",
        "q_sim_knn_ivf_learned", "q_sim_knn_pq"))
      assert(rec("q_sim_knn_sq8") >= rec(ann),
        s"full-scan sq8 below pruning/quantized $ann: $rec")
  }

  test("recall floors hold at the BENCH scale (sf0.1) too") {
    // The r12 regressions (ivf 0.65→0.49, lsh_mp < lsh, ivfpq under
    // plain learned IVF) all manifested at sf0.1 — the scale the round
    // bench reports — while the oracle-gate scale looked fine. One
    // panel run at sf0.1 (~2k-row corpus, a few seconds) pins the same
    // ordering and floors where the regression actually shipped.
    // Measured r14 sf0.1: lsh 0.445, lsh_mp 0.540, ivf 0.605, learned
    // 0.670, ivfpq 0.780, sq8 0.880, pq_rerank 0.900 (the fractional
    // ceil(2n/5) breadth repaired r13's 0.475 — the floor pins the
    // repaired point so a constant-breadth regression fails here);
    // floors leave regeneration margin.
    val rec = graft.queries.Similarity.recallVsBrute(spark,
      "/root/testdata/sf0.1",
      annNames = Seq("q_sim_knn_brute", "q_sim_knn_lsh", "q_sim_knn_lsh_mp",
        "q_sim_knn_ivf", "q_sim_knn_ivf_learned",
        "q_sim_knn_ivf_learned_k64", "q_sim_knn_ivfpq",
        "q_sim_knn_sq8", "q_sim_knn_pq_rerank", "q_sim_knn_pq_prod",
        "q_sim_knn_matryoshka"))
    val floors = Seq("q_sim_knn_lsh" -> 0.40, "q_sim_knn_lsh_mp" -> 0.48,
      "q_sim_knn_ivf" -> 0.55, "q_sim_knn_ivf_learned" -> 0.60,
      "q_sim_knn_ivfpq" -> 0.70, "q_sim_knn_sq8" -> 0.80,
      "q_sim_knn_pq_rerank" -> 0.80,
      // r17 production paths, measured sf0.1: k64 0.675 (vs learned
      // 0.670 at the same scan fraction), pq_prod 0.835 — the sf1 probe
      // measured this exact point holding 0.835→0.840 at 10× data, so
      // the floor pins the sublinear schedule's operating recall where
      // the bench reports it
      "q_sim_knn_ivf_learned_k64" -> 0.60, "q_sim_knn_pq_prod" -> 0.78,
      // matryoshka shortlist max(16k, 2*ceil(sqrt n)) — SUBLINEAR in the
      // corpus (r16; the earlier n/25 floor was linear-in-n). r18 prefix
      // width 32 -> 40 (recall-per-byte sweep): measured 0.870 at sf0.1
      // and 0.865 at sf1 (was 0.685/0.695 — the r17 "lowest rung"
      // plateau was prefix width, not shortlist), still a tiny fraction
      // of pq_rerank's 40% repair breadth
      "q_sim_knn_matryoshka" -> 0.80)
    for ((ann, floor) <- floors)
      assert(rec(ann) >= floor, s"$ann below its $floor sf0.1 floor: $rec")
    assert(rec("q_sim_knn_lsh_mp") >= rec("q_sim_knn_lsh"),
      s"multi-probe LSH below the multi-table gate at sf0.1: $rec")
    assert(rec("q_sim_knn_ivfpq") >= rec("q_sim_knn_ivf_learned"),
      s"IVF-PQ composite below plain learned IVF at sf0.1: $rec")
  }

  test("probeMasks: combinatorial counts, distinct ascending, no 2^n " +
      "enumeration at high plane counts") {
    assert(Similarity.probeMasks(8, 0) === Seq(0L))
    assert(Similarity.probeMasks(8, 1).length === 9)     // 1 + C(8,1)
    val m = Similarity.probeMasks(8, 2)
    assert(m.length === 37)                              // 1 + 8 + C(8,2)
    assert(m === m.sorted && m.distinct.length === m.length)
    assert(m.forall(x => java.lang.Long.bitCount(x) <= 2))
    // high plane counts must stay O(masks), not O(2^planes) — this call
    // would hang (or silently return wrong masks at the Long shift wrap)
    // under a range-scan implementation
    val big = Similarity.probeMasks(63, 1)
    assert(big.length === 64 && big.contains(1L << 62))
    intercept[IllegalArgumentException](Similarity.probeMasks(64, 1))
    intercept[IllegalArgumentException](Similarity.probeMasks(8, 9))
  }
}
