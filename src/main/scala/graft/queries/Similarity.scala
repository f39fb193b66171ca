package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Similarity => Sim}

/** Embedding similarity search queries (brute-force + LSH-bucketed ANN),
  * each oracle-checked against DuckDB computing the identical sequential
  * double fold (DuckFrag.dotSql), so cosines match bitwise.
  *
  * Scale notes: the query set is always broadcast (the corpus never
  * shuffles); the near-dup pass is LSH-bucketed — the raw all-pairs kernel
  * (Sim.cosineNearDupPairs) is deliberately NOT wired as a query.
  */
object Similarity {

  private val QueryIds = Seq(1L, 5L, 10L, 77L)
  private[graft] val K = 5
  private val NumPlanes = 8
  private val Dim = 64
  /** Multi-table OR-construction sizing for q_sim_knn_lsh. The synthetic
    * corpus is weakly clustered (true-neighbor cosines ≈ 0.35–0.48, so
    * per-plane bit-agreement ≈ 0.62): a single 8-bit table collides with a
    * true neighbor ~0.62^8 ≈ 2% of the time (measured recall 0.0 in r11).
    * 4 tables × 4 bits gives 1−(1−0.62⁴)⁴ ≈ 0.47 expected recall at a
    * ~25% candidate scan — panel recall 0.45 at both sf0.01 and sf0.1. */
  private val NumTables = 4
  private val BitsPerTable = 4
  /** Multi-probe sizing for q_sim_knn_lsh_mp, decoupled from the
    * multi-table gate's planes: ONE 9-bit table probing every bucket
    * within Hamming distance 3 of the query's bucket (1+9+36+84 = 130 of
    * 512 buckets ≈ 25% expected candidate scan — the SAME scan fraction
    * as q_sim_knn_lsh's 4×4 OR-construction). At per-bit agreement
    * p ≈ 0.62 the collision probability is P[Binom(9, 0.38) ≤ 3] ≈ 0.53
    * vs the table gate's 1−(1−0.62⁴)⁴ ≈ 0.47 — multi-probe's entire
    * point is buying table-OR recall without storing L index copies, so
    * the ladder spec pins mp ≥ lsh at equal scan cost (r12 shipped a
    * 8-bit/radius-2 point that measured BELOW the table gate). Probe
    * expansion stays broadcast-side only. */
  private val MpPlanes = 9
  private val MpProbeRadius = 3
  /** Probe breadths of the two IVF gates, chosen on the 40-query
    * [[RecallPanel]] (the 4-query gate sample is 0.05-granularity noise —
    * r12 measured random centroid placement alone moving it 0.00–0.65).
    * r12 shipped 2-of-8 cells (≈ 25% scan: seed 0.46–0.49, learned
    * 0.545–0.55) and rode a silent 16-point seed-recall drop vs r11; the
    * r13 operating point probes 3-of-8 cells (≈ 37% scan) to hold both
    * gates above the 0.55 floor the ladder spec now pins at both scales —
    * on a weakly-clustered corpus (true-neighbor cosines 0.35–0.48) cell
    * membership is diffuse, and probe breadth is the only honest recall
    * lever plain IVF has (the learned gate still beats the seed heuristic
    * at equal breadth, and IVF-PQ's re-rank stays above both). Seed at
    * nProbe=1 measured 0.23–0.27: below any honest floor. */
  private val IvfSeedProbe = 3
  private val IvfLearnedProbe = 3

  /** IVF-PQ composite operating point (operators.Ivfpq): 8 coarse cells ×
    * residual PQ with exact re-rank, sized on the 40-query RecallPanel
    * like every other ANN gate. The residual codebook is FINER than the
    * plain-PQ gate's deliberately-coarse m=4/k=8 (which measured ADC-alone
    * recall ≈ 0.06): at m=8/k=32 the ADC ordering is good enough that a
    * wide exact re-rank recovers most of the nProbe=4 cell recall — the
    * production tradeoff IVF-PQ exists for (finer codes cost bytes, probe
    * breadth costs scan, re-rank costs exact distances). Re-rank breadth
    * is FRACTIONAL (Pq.rerankBreadth, ⌈2n/5⌉): r13's constant 400 held
    * the composite above plain learned IVF at both scales, but only
    * because 400 happened to be 20% of the sf0.1 corpus — at the next
    * scale-up it would shrink to the r12 failure (probe 3 / re-rank 200
    * fell to 0.56 vs learned-IVF's 0.67). 2 Lloyd rounds measured within
    * 0.005 recall of 3 at ~half the training jobs. Ladder floors in
    * SimilaritySpec. */
  private val IvfPqCells = 8
  private val IvfPqProbe = 4
  private val IvfPqM = 8
  private val IvfPqK = 32
  private val IvfPqSubDim = Dim / IvfPqM

  /** Side-table pair handing the IVF-PQ index to the oracle (same contract
    * as [[CentroidDumpBase]]): the coarse centroids and the residual
    * codebooks the plan scored with. */
  private val IvfPqCentDumpBase =
    "/root/repo/target/oracle_aux/ivfpq_centroids_"
  private val IvfPqCbDumpBase =
    "/root/repo/target/oracle_aux/ivfpq_codebooks_"

  /** Side-table handing the LEARNED k-means|| centroids to the oracle: the
    * query fn dumps the exact centroid set its plan scores with, and the
    * oracle recomputes assign+probe+top-k in DuckDB from that parquet — so
    * the gate checks the whole scoring pipeline bitwise without requiring
    * DuckDB to replay the k-means|| training loop (whose distributed avg()
    * sums in partition order, which no cross-engine SQL can reproduce).
    *
    * The path is suffixed with the SF-dir name: every scale a run touches
    * dumps to its own table, so a concurrent run at another SF (e.g. the
    * test suite exercising sf0.001 while the sf0.01 oracle dump awaits its
    * DuckDB read) can never overwrite the dump the oracle is about to
    * consume. The SQL literal below names the sf0.01 table (the scale the
    * driver's gate runs at); Verify rewrites that suffix to its own run
    * scale when dumping oracle_sql.json, so the oracle reads the matching
    * aux table at ANY sf (identity at sf0.01). */
  private val CentroidDumpBase =
    "/root/repo/target/oracle_aux/ivf_centroids_learned_"
  private def centroidDump(dir: String): String =
    CentroidDumpBase + new java.io.File(dir).getName

  /** Side-table handing the PQ codebooks to the oracle (same contract and
    * same-scale-concurrency story as [[CentroidDumpBase]]): (sub, cid, cv)
    * rows, cid 0-based within each subspace. */
  private val PqDumpBase = "/root/repo/target/oracle_aux/pq_codebooks_"
  private def pqDump(dir: String): String =
    PqDumpBase + new java.io.File(dir).getName

  private val PqM = 4
  private val PqK = 8
  private val PqSubDim = Dim / PqM
  /** Exact-rerank candidate breadth — FRACTIONAL via [[Pq.rerankBreadth]]
    * (⌈2n/5⌉, never below K). The m=4/k=8 ADC is deliberately coarse (it
    * is the memory-compression gate), so repairing recall is entirely the
    * re-rank's job, and r13's constant 200 was a shrinking fraction of a
    * growing corpus: recall 0.84 at sf0.01 (200 = 40% of 500 rows) fell
    * to 0.475 at sf0.1 (200 = 10% of 2000). At 2/5 the breadth is 200 at
    * sf0.01 (bit-identical gate results) and 800 at sf0.1 (the repaired
    * operating point); cost stays linear — breadth·|queries| exact
    * cosines by id-join. */
  private def pqRerankFor(n: Long): Int = graft.operators.Pq.rerankBreadth(n, K)

  /** PRODUCTION PQ operating point (r16 verdict item 3 — probe-only
    * through r16, oracle-gated from r17): m=16 subspaces × 32 centroids
    * (the production-shaped codebook whose ADC ordering is good enough
    * for a sublinear repair pass — [[graft.operators.Pq
    * .rerankBreadthSublinear]]'s documented precondition) with re-rank
    * breadth max(8k, ⌈√n⌉) — SUBLINEAR in the corpus, unlike the
    * coarse-codebook gate's deliberately wide ⌈2n/5⌉ fraction. The sf1
    * probe measured this point holding recall 0.835→0.840 across a 10×
    * corpus growth while the exact pass shrinks as a corpus fraction.
    * Codebook side-table contract identical to [[PqDumpBase]]. */
  private val PqProdM = 16
  private val PqProdK = 32
  private val PqProdSubDim = Dim / PqProdM
  private val PqProdDumpBase =
    "/root/repo/target/oracle_aux/pq_codebooks_prod_"
  private def pqProdDump(dir: String): String =
    PqProdDumpBase + new java.io.File(dir).getName
  private def pqProdRerankFor(n: Long): Int =
    graft.operators.Pq.rerankBreadthSublinear(n, K)
  /** DuckDB mirror of [[Pq.rerankBreadthSublinear]]: IEEE-754 requires
    * sqrt correctly rounded and n < 2⁵³ converts exactly, so both
    * engines' ceil(sqrt(n)) are the same integer (the matryoshka
    * shortlist's established cross-engine argument). */
  private val ProdRerankSql =
    s"greatest(${8 * K}, CAST(ceil(sqrt(" +
      "(SELECT count(*) FROM n))) AS BIGINT))"

  /** Production-PQ training without the dump (recall-panel entry). */
  private def pqProdTrainOnly(s: org.apache.spark.sql.SparkSession,
      dir: String)
      : (org.apache.spark.sql.DataFrame, Seq[Seq[Array[Double]]]) = {
    val corpus = preparedCorpus(s, dir)
    val cbs = graft.operators.Pq.trainCodebooks(corpus, PqProdM, PqProdK,
      lloydIters = 2)
    (corpus, cbs)
  }

  /** [[pqProdTrainOnly]] + the oracle side-table. */
  private def pqProdTrained(s: org.apache.spark.sql.SparkSession,
      dir: String)
      : (org.apache.spark.sql.DataFrame, Seq[Seq[Array[Double]]]) = {
    val (corpus, cbs) = pqProdTrainOnly(s, dir)
    import s.implicits._
    writeTableAtomically(
      cbs.zipWithIndex.flatMap { case (cb, sub) =>
        cb.zipWithIndex.map { case (cv, cid) => (sub, cid, cv.toSeq) }
      }.toDF("sub", "cid", "cv"),
      pqProdDump(dir))
    (corpus, cbs)
  }
  /** DuckDB mirror of [[Pq.rerankBreadth]] over the prepared-corpus CTE
    * `n` — same ceil-division integers, computed from the same table. */
  private val RerankBreadthSql =
    s"greatest($K, (${graft.operators.Pq.RerankNum} * (SELECT count(*) FROM n)" +
      s" + ${graft.operators.Pq.RerankDenom - 1}) // ${graft.operators.Pq.RerankDenom})"

  /** Side-table handing the SemDeDup centroids to the oracle (same
    * contract as [[CentroidDumpBase]]; separate path because the learned-
    * IVF gate overwrites that one with its own training params). */
  private val SemDumpBase = "/root/repo/target/oracle_aux/semdedup_centroids_"
  private def semDump(dir: String): String =
    SemDumpBase + new java.io.File(dir).getName
  private val SemThreshold = 0.3

  /** Side-table for the AUTO-k SemDeDup gate — k is derived from the
    * corpus count there, so the centroid set differs per scale and needs
    * its own dump path. */
  private val SemAutoDumpBase =
    "/root/repo/target/oracle_aux/semdedup_auto_centroids_"
  private def semAutoDump(dir: String): String =
    SemAutoDumpBase + new java.io.File(dir).getName

  /** Side-table for the auto gate's coarse GROUP centers — the second
    * half of the bucketed-assignment replay (the first is the gid column
    * on the centroid dump): the oracle ranks these by (cos DESC, gid) per
    * row and argmaxes over the top-[[Sim.GroupProbes]] groups' members. */
  private val SemAutoGroupsBase =
    "/root/repo/target/oracle_aux/semdedup_auto_groups_"
  private def semAutoGroupsDump(dir: String): String =
    SemAutoGroupsBase + new java.io.File(dir).getName
  /** Auto-k cell-size target for the gate: small enough that the derived
    * k actually moves across scales (500 rows → k=4, 2000 → k=16),
    * proving the auto path is exercised rather than collapsing to the
    * fixed-k gate's k=8. */
  private val SemAutoCell = 125L

  /** Shared SemDeDup oracle: replay assignment, within-cell pair
    * generation, and the connected-component fold from the dumped
    * centroid table — the same SQL serves the fixed-k and auto-k gates
    * because k lives entirely in the side-table. */
  private def semDedupOracleSql(dumpBase: String): String =
    s"""WITH RECURSIVE p AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT id, v, sqrt(${DuckFrag.dotSql("v", "v")}) AS nrm FROM p),
       |cent AS (
       |  SELECT cid, CAST(cv AS DOUBLE[]) AS cv, cnrm
       |  FROM read_parquet('${dumpBase}sf0.01/*.parquet')),
       |ranked AS (
       |  SELECT n.id, n.v, n.nrm, cent.cid AS cell,
       |         row_number() OVER (PARTITION BY n.id ORDER BY
       |           ${DuckFrag.cosineSql("n.v", "n.nrm", "cent.cv", "cent.cnrm")}
       |             DESC, cent.cid) AS rk
       |  FROM n, cent),
       |assign AS (
       |  SELECT id, v, nrm, cell FROM ranked WHERE rk = 1),
       |pairs AS MATERIALIZED (
       |  SELECT x.id AS id1, y.id AS id2
       |  FROM assign x JOIN assign y ON x.cell = y.cell AND x.id < y.id
       |  WHERE ${DuckFrag.cosineSql("x.v", "x.nrm", "y.v", "y.nrm")}
       |    >= $SemThreshold),
       |edges AS (
       |  SELECT id1 AS a, id2 AS b FROM pairs
       |  UNION ALL SELECT id2, id1 FROM pairs),
       |${DuckFrag.componentCtes}
       |SELECT a.id, a.cell,
       |       coalesce(g.keeper, a.id) AS keeper,
       |       coalesce(g.keeper, a.id) = a.id AS keep
       |FROM assign a LEFT JOIN comp g ON g.id = a.id
       |ORDER BY a.id""".stripMargin

  /** SemDeDup oracle for the BUCKETED assignment path: replays the exact
    * two-level rule [[Sim.assignCellsGrouped]] runs — rank the dumped
    * coarse group centers by (cos DESC, gid) per row, keep the top
    * [[Sim.GroupProbes]], argmax (cos DESC, cid) over those groups' fine
    * members — then the same pair/component fold as the flat oracle. Both
    * ranking keys are the bit-exact sequential-fold cosine, so the probe
    * set and the argmax agree across engines. */
  private def semDedupBucketedOracleSql(centsBase: String,
      groupsBase: String, nProbe: Int): String =
    s"""WITH RECURSIVE p AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT id, v, sqrt(${DuckFrag.dotSql("v", "v")}) AS nrm FROM p),
       |cent AS (
       |  SELECT cid, CAST(cv AS DOUBLE[]) AS cv, cnrm, gid
       |  FROM read_parquet('${centsBase}sf0.01/*.parquet')),
       |cgrp AS (
       |  SELECT gid, CAST(gv AS DOUBLE[]) AS gv, gn
       |  FROM read_parquet('${groupsBase}sf0.01/*.parquet')),
       |gsc AS (
       |  SELECT n.id, cgrp.gid,
       |         row_number() OVER (PARTITION BY n.id ORDER BY
       |           ${DuckFrag.cosineSql("n.v", "n.nrm", "cgrp.gv", "cgrp.gn")}
       |             DESC, cgrp.gid) AS grk
       |  FROM n, cgrp),
       |probe AS (SELECT id, gid FROM gsc WHERE grk <= $nProbe),
       |ranked AS (
       |  SELECT n.id, n.v, n.nrm, cent.cid AS cell,
       |         row_number() OVER (PARTITION BY n.id ORDER BY
       |           ${DuckFrag.cosineSql("n.v", "n.nrm", "cent.cv", "cent.cnrm")}
       |             DESC, cent.cid) AS rk
       |  FROM n JOIN probe ON probe.id = n.id
       |  JOIN cent ON cent.gid = probe.gid),
       |assign AS (
       |  SELECT id, v, nrm, cell FROM ranked WHERE rk = 1),
       |pairs AS MATERIALIZED (
       |  SELECT x.id AS id1, y.id AS id2
       |  FROM assign x JOIN assign y ON x.cell = y.cell AND x.id < y.id
       |  WHERE ${DuckFrag.cosineSql("x.v", "x.nrm", "y.v", "y.nrm")}
       |    >= $SemThreshold),
       |edges AS (
       |  SELECT id1 AS a, id2 AS b FROM pairs
       |  UNION ALL SELECT id2, id1 FROM pairs),
       |${DuckFrag.componentCtes}
       |SELECT a.id, a.cell,
       |       coalesce(g.keeper, a.id) AS keeper,
       |       coalesce(g.keeper, a.id) = a.id AS keep
       |FROM assign a LEFT JOIN comp g ON g.id = a.id
       |ORDER BY a.id""".stripMargin

  /** Prepared gate corpus, persisted WITHOUT an unpersist: the returned
    * frame feeds BOTH the eager training collects inside the trainOnly
    * helpers AND the lazy search plan the gate hands back (which scans it
    * up to three times — coding, query fetch, re-rank fetch). The r12
    * spelling unpersisted right after training, so every one of those
    * search scans re-derived the prepared/norm lineage — the ADVICE
    * finding knnIvfPq fixed for a path with no callers while the live
    * gate path kept the bug. No unpersist is deliberate and safe here:
    * the prepared gate corpus is ~|embeddings|·dim doubles (about a
    * megabyte at bench scale), cached entries are evicted by Spark's
    * unified memory manager under pressure and released by the
    * ContextCleaner once the frame is unreachable, and re-invocations of
    * the same gate re-find the same cached plan (the "already cached"
    * CacheManager warning, not a second copy). Production callers sizing
    * real corpora manage their own lifecycle (see knnIvfPq's
    * consume-then-release pattern). */
  private def preparedCorpus(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Sim.prepared(tbl(s, dir, "embeddings"), "embedding", "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** PQ training without the oracle side-table dump — the recall panel's
    * entry (training is deterministic, so panel and gate score with
    * identical codebooks). */
  private def pqTrainOnly(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, Seq[Seq[Array[Double]]]) = {
    val corpus = preparedCorpus(s, dir)
    val cbs = graft.operators.Pq.trainCodebooks(corpus, PqM, PqK,
      lloydIters = 2)
    (corpus, cbs)
  }

  /** Shared by the two PQ gates: train (deterministic, so both gates get
    * the identical codebooks), dump the side-table, return (corpus, cbs). */
  private def pqTrained(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, Seq[Seq[Array[Double]]]) = {
    val (corpus, cbs) = pqTrainOnly(s, dir)
    import s.implicits._
    writeTableAtomically(
      cbs.zipWithIndex.flatMap { case (cb, sub) =>
        cb.zipWithIndex.map { case (cv, cid) => (sub, cid, cv.toSeq) }
      }.toDF("sub", "cid", "cv"),
      pqDump(dir))
    (corpus, cbs)
  }

  /** IVF-PQ training without the dump (same contract as [[pqTrainOnly]];
    * training is deterministic, so the recall panel, the gate, and the
    * oracle all score the identical index). */
  private def ivfpqTrainOnly(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, Seq[Sim.Cent],
        Seq[Seq[Array[Double]]]) = {
    val corpus = preparedCorpus(s, dir)
    val (cents, cbs) = graft.operators.Ivfpq.train(corpus, IvfPqCells,
      IvfPqM, IvfPqK, lloydIters = 2)
    (corpus, cents, cbs)
  }

  /** [[ivfpqTrainOnly]] + the two oracle side-tables (coarse centroids and
    * residual codebooks). */
  private def ivfpqTrained(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, Seq[Sim.Cent],
        Seq[Seq[Array[Double]]]) = {
    val (corpus, cents, cbs) = ivfpqTrainOnly(s, dir)
    import s.implicits._
    val sfx = new java.io.File(dir).getName
    writeTableAtomically(
      cents.map(c => (c.cid, c.cv.toSeq, c.cnrm)).toDF("cid", "cv", "cnrm"),
      IvfPqCentDumpBase + sfx)
    writeTableAtomically(
      cbs.zipWithIndex.flatMap { case (cb, sub) =>
        cb.zipWithIndex.map { case (cv, cid) => (sub, cid, cv.toSeq) }
      }.toDF("sub", "cid", "cv"),
      IvfPqCbDumpBase + sfx)
    (corpus, cents, cbs)
  }

  /** Learned-IVF training without the dump (same contract as
    * [[pqTrainOnly]]). */
  private def ivfTrainOnly(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, Seq[Sim.Cent]) = {
    val corpus = preparedCorpus(s, dir)
    val cents = Sim.kmeansCentroidsSeq(corpus, k = 8, lloydIters = 3)
    (corpus, cents)
  }

  /** PRODUCTION-dispatch IVF training: k = [[Sim.LloydBucketedMinK]], so
    * `kmeansDriver`'s DEFAULT dispatch (no override) runs every Lloyd
    * round through the bucketed two-level assignment — the code path
    * every production caller (thousands of cells at constant cell size)
    * actually hits, which through r16 was pinned only by specs and the
    * sf1 probe, never by a DuckDB oracle hash (r16 verdict item 1; the
    * 8-cell learned gate deliberately trains BELOW the threshold so its
    * centroids stayed bitwise unchanged when the default flipped).
    * SimilaritySpec pins, via [[Sim.bucketedAssignCalls]], that this
    * training really dispatches bucketed — one invocation per Lloyd
    * round. The oracle replay is unchanged in shape: training hands the
    * centroid set to DuckDB via the parquet side-table, and the oracle
    * recomputes assign/probe/score/rank bitwise from it — so a change
    * anywhere in the bucketed Lloyd trajectory changes the dumped
    * centroids and the gate hash with it. */
  private val K64Cells: Int = Sim.LloydBucketedMinK
  private val K64Lloyd = 2
  /** Probe breadth: 16 of ~64 cells ≈ 25% scan, the same scan fraction
    * as the LSH gates; cells that lose every member during Lloyd vanish
    * from the centroid set, so the effective probe count is
    * min(16, |cents|) — mirrored in SQL as least(16, count(cent)). */
  private val K64Probe = 16
  private val K64DumpBase =
    "/root/repo/target/oracle_aux/ivf_centroids_k64_"
  private def k64Dump(dir: String): String =
    K64DumpBase + new java.io.File(dir).getName

  private def ivfK64TrainOnly(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, Seq[Sim.Cent]) = {
    val corpus = preparedCorpus(s, dir)
    val cents = Sim.kmeansCentroidsSeq(corpus, k = K64Cells,
      lloydIters = K64Lloyd)
    (corpus, cents)
  }

  /** Oracle prelude shared by the PQ gates (parameterized over the dumped
    * codebook table and its (m, subDim) shape): per-(row, sub, cid)
    * squared L2 distances, 0-based codes per row, and per-query ADC
    * tables — all from the dumped codebooks, mirroring
    * Pq.codesFor/qtabFor fold-for-fold. */
  private def pqCtesFor(dumpBase: String, m: Int, subDim: Int): String = {
    val sub = s"list_slice(n.v, cb.sub*$subDim + 1, cb.sub*$subDim + $subDim)"
    s"""cb AS (
       |  SELECT sub, cid, CAST(cv AS DOUBLE[]) AS cv
       |  FROM read_parquet('${dumpBase}sf0.01/*.parquet')),
       |dist AS (
       |  SELECT n.id, cb.sub, cb.cid,
       |         ${DuckFrag.l2sqSql(sub, "cb.cv")} AS d
       |  FROM n, cb),
       |codes AS (
       |  SELECT id, list(cid ORDER BY sub) AS codes FROM (
       |    SELECT id, sub, cid, row_number() OVER (
       |      PARTITION BY id, sub ORDER BY d, cid) AS rk FROM dist)
       |  WHERE rk = 1 GROUP BY id),
       |qt AS (
       |  SELECT id AS query_id, sub, list(d ORDER BY cid) AS tab
       |  FROM dist WHERE id IN $queryIdList GROUP BY id, sub),
       |qtab AS (
       |  SELECT query_id, list(tab ORDER BY sub) AS qtab
       |  FROM qt GROUP BY query_id),
       |adc AS (
       |  SELECT q.query_id, c.id AS neighbor_id,
       |         list_reduce(list_prepend(0.0, list_transform(
       |           range(1, $m + 1), s -> q.qtab[s][c.codes[s] + 1])),
       |           (acc, x) -> acc + x) AS adc_dist
       |  FROM codes c, qtab q WHERE c.id <> q.query_id),
       |radc AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) rn
       |  FROM adc)""".stripMargin
  }

  /** The two coarse-codebook PQ gates' prelude (the r13-era shape). */
  private def pqCtes: String = pqCtesFor(PqDumpBase, PqM, PqSubDim)

  /** DuckDB prelude: corpus as DOUBLE[] vectors with precomputed norms —
    * mirrors Sim.prepared. */
  private val preparedCte =
    s"""WITH p AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT id, v, sqrt(${DuckFrag.dotSql("v", "v")}) AS nrm FROM p)""".stripMargin

  /** Literal hyperplane as a DuckDB DOUBLE list (mirrors Sim.planes —
    * Scala Double.toString round-trips exactly, so both engines see the
    * same IEEE values). */
  private def planeSql(w: Array[Double]): String =
    w.map(x => s"CAST($x AS DOUBLE)").mkString("[", ", ", "]")

  /** Σ_p (dot(v, w_p) > 0 ? 2^p : 0) over the given planes — mirrors
    * Sim.lshBucket (bit index = position within `ps`). */
  private def bucketSqlFor(vecExpr: String, ps: Seq[Array[Double]]): String =
    ps.zipWithIndex.map { case (w, p) =>
      s"(CASE WHEN ${DuckFrag.dotSql(vecExpr, planeSql(w))} > 0 " +
        s"THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  private def bucketSql(vecExpr: String): String =
    bucketSqlFor(vecExpr, Sim.planes(NumPlanes, Dim))

  private val queryIdList = QueryIds.mkString("(", ", ", ")")

  /** [[QueryIds]] as a DuckDB ARRAY literal body — for oracles that need
    * the id set as ROWS (unnest) rather than an IN predicate. */
  private val queryIdArraySql = QueryIds.mkString("[", ", ", "]")

  /** Matryoshka adaptive-retrieval operating point: score the first 40 of
    * 64 dims on the full scan (5/8 of the FLOPs/bytes), keep the floored
    * shortlist below, re-rank exactly. Unlike PQ's corpus-fraction repair,
    * the shortlist is a small multiple of K by design — the MRL premise is
    * that the prefix ordering is already good. That premise is a property
    * of MRL-TRAINED embeddings; the synthetic corpus spreads information
    * evenly, so the honest operating point here needs most of the dims
    * (prefix 16 measured 0.45/0.235 across scales — a floor violation).
    * Prefix width 40 is the r18 SWEEP decision (MAT_PREFIX_PROBE.json,
    * arms 32/40/48 at sf0.1 and sf1): recall-per-scanned-byte peaks at 40
    * on sf0.1 (1.392 vs 32's 1.370 and 48's 1.293) and ties the peak at
    * sf1 (1.384 vs 1.390), while recall jumps 0.685/0.695 → 0.870/0.865 —
    * the r17 verdict's "lowest real rung" plateau was a prefix-width
    * artifact, not a shortlist one (the r17 floor sweep had already shown
    * the shortlist inert at scale). 48 buys 0.94-0.97 but at falling
    * recall-per-byte — past the knee. On real MRL vectors the same
    * machinery runs at 8-16 of 768 dims; prefix width is the caller's
    * knob.
    *
    * Shortlist: max(8·K, 2·⌈√n⌉) — a small multiple of k with a SUBLINEAR
    * corpus term ([[graft.operators.Pq.rerankBreadthSublinear]]'s shape;
    * the 2× multiplier is the recall-preserving constant on this
    * evenly-spread corpus). On MRL-true embeddings the k-multiple alone
    * suffices; on this corpus a constant 40 measured 0.74 at sf0.01 but
    * 0.50 at sf0.1 (the shrinking-fraction trend the PQ re-rank fix
    * addressed). The earlier ⌈n/25⌉ corpus floor repaired that (0.66 at
    * sf0.1) but is LINEAR in n — the sf1 probe measured its shortlist
    * shuffle growing ×1778 per ×10 data (tiny absolute MB, wrong growth
    * law for 100 TB). 2·⌈√n⌉ sits at the same gate-scale operating
    * points (46 vs 40 at n=500, 90 vs 80 at n=2000 — recall re-measured
    * 0.775/0.685, up from 0.74/0.66) while the exact pass shrinks as a
    * corpus fraction, like the PQ production schedule. Exactness regime
    * preserved: prefix = dim ∧ shortlist = n is still brute
    * (RandomizedParitySpec pins it). ⌈√n⌉ crosses engines bit-exactly:
    * IEEE-754 requires sqrt correctly rounded, n < 2⁵³ converts exactly,
    * so Spark's and DuckDB's ceil(sqrt(n)) are the same integer.
    *
    * Floor = 16·K (r17 sweep, r16 verdict item 7): the k-multiple floor
    * only binds below n = (16k/2)² = 1600 — above that the sublinear
    * √n term IS the shortlist (90 at n=2000 under either floor, so the
    * production growth law is untouched) — and where it binds it buys
    * real recall: 0.890 vs 0.775 at n=500 for 34 more exact rows per
    * query (16% vs 9% of that corpus). Recall-per-byte favors 16k
    * everywhere it has any effect. */
  private[graft] val MatPrefixDim = 40
  /** The pre-r18 prefix width, kept ONLY so MatPrefixProbe's sweep always
    * carries the below-the-knee baseline arm alongside the shipped point
    * (same rule as [[MatShortlistMinPrior]]): a retune must not leave the
    * probe unable to reproduce the committed decision artifact. */
  private[graft] val MatPrefixDimPrior = 32
  private[graft] val MatShortlistMin = 16 * K
  /** The pre-r17 floor (8·K), kept ONLY so the sf1 probe's old-vs-new
    * floor sweep derives both arms from named constants instead of
    * hardcoding them (r17 ADVICE: a future floor retune would leave the
    * probe silently sweeping stale arms). Never used by an operator. */
  private[graft] val MatShortlistMinPrior = 8 * K
  private[graft] def matShortlistFor(n: Long): Int =
    math.min(math.max(MatShortlistMin.toLong,
      2L * math.ceil(math.sqrt(math.max(0L, n).toDouble)).toLong),
      Int.MaxValue.toLong).toInt
  /** DuckDB mirror of [[matShortlistFor]] over the prepared-corpus CTE. */
  private val MatShortlistSql =
    s"greatest($MatShortlistMin, 2 * CAST(ceil(sqrt(" +
      "(SELECT count(*) FROM n))) AS BIGINT))"

  /** Hybrid-retrieval RRF fusion sizing: lexical shortlist = vector
    * shortlist = 50, fused top-10, the canonical rrfK = 60 (Cormack et
    * al. 2009). The lexical ranking orders on INTEGER term-frequency
    * (ties by doc_id) — the ranking-ulp rule (q_bm25's scaladoc): a
    * cross-engine gate must never rank on ln()-derived doubles. */
  private val RrfTerms = Seq("spark", "join", "window")
  private val RrfShortlist = 50
  private val RrfTopK = 10

  /** Each ANN gate's scoring core, parameterized by the query-id set. The
    * oracle gates bind [[QueryIds]] (4 ids — the DuckDB replay is
    * O(|queries| · corpus), so the cross-engine compare stays cheap);
    * [[recallVsBrute]] binds the 40-id [[RecallPanel]]. One spelling of
    * each operator's parameters, so the recall the bench reports is the
    * recall of exactly the configuration the gate ships. */
  private val AnnCores: Map[String,
      (org.apache.spark.sql.SparkSession, String, Seq[Long]) =>
        org.apache.spark.sql.DataFrame] = Map(
    "q_sim_knn_brute" -> ((s, dir, q) =>
      Sim.knnBrute(tbl(s, dir, "embeddings"), "embedding", "vec_id", q, K)),
    "q_sim_knn_lsh" -> ((s, dir, q) =>
      Sim.knnLshTables(tbl(s, dir, "embeddings"), "embedding", "vec_id", q,
        K, NumTables, BitsPerTable, Dim)),
    "q_sim_knn_lsh_mp" -> ((s, dir, q) =>
      Sim.knnLsh(tbl(s, dir, "embeddings"), "embedding", "vec_id", q, K,
        MpPlanes, Dim, probes = MpProbeRadius)),
    "q_sim_knn_ivf" -> ((s, dir, q) =>
      Sim.knnIvf(tbl(s, dir, "embeddings"), "embedding", "vec_id", q, K,
        numCentroids = 8, nProbe = IvfSeedProbe)),
    "q_sim_knn_ivf_learned" -> ((s, dir, q) => {
      val (corpus, cents) = ivfTrainOnly(s, dir)
      Sim.knnIvfFrom(corpus, cents, q, K, nProbe = IvfLearnedProbe)
    }),
    "q_sim_knn_ivf_learned_k64" -> ((s, dir, q) => {
      val (corpus, cents) = ivfK64TrainOnly(s, dir)
      Sim.knnIvfFrom(corpus, cents, q, K,
        nProbe = math.min(K64Probe, cents.size))
    }),
    "q_sim_knn_pq" -> ((s, dir, q) => {
      val (corpus, cbs) = pqTrainOnly(s, dir)
      graft.operators.Pq.knnPqFrom(corpus, cbs, q, K)
    }),
    "q_sim_knn_ivfpq" -> ((s, dir, q) => {
      val (corpus, cents, cbs) = ivfpqTrainOnly(s, dir)
      graft.operators.Ivfpq.knnIvfPqFrom(corpus, cents, cbs, q, K,
        IvfPqProbe, pqRerankFor(corpus.count()))
    }),
    "q_sim_knn_pq_rerank" -> ((s, dir, q) => {
      val (corpus, cbs) = pqTrainOnly(s, dir)
      graft.operators.Pq.knnPqFrom(corpus, cbs, q, K,
        rerank = pqRerankFor(corpus.count()))
    }),
    "q_sim_knn_pq_prod" -> ((s, dir, q) => {
      val (corpus, cbs) = pqProdTrainOnly(s, dir)
      graft.operators.Pq.knnPqFrom(corpus, cbs, q, K,
        rerank = pqProdRerankFor(corpus.count()))
    }),
    "q_sim_knn_sq8" -> ((s, dir, q) =>
      graft.operators.Sq.knnSq8(tbl(s, dir, "embeddings"), "embedding",
        "vec_id", q, K)),
    "q_sim_knn_matryoshka" -> ((s, dir, q) => {
      val emb = tbl(s, dir, "embeddings")
      Sim.knnTruncated(emb, "embedding", "vec_id", q,
        K, MatPrefixDim, matShortlistFor(emb.count()))
    }))

  /** Recall measurement panel: 40 spread ids, all within the 500 rows every
    * sf's embeddings table carries. The oracle gates keep their 4 fixed ids
    * (cheap DuckDB replay), but 4 queries × k=5 is a 20-pair sample —
    * measured on this corpus, random centroid placement alone moves 4-query
    * IVF recall across 0.00–0.65, so a 4-query recall is sampling noise,
    * not an operating point. 200 pairs brings the noise under ~±0.07,
    * small against the ladder spec's floor gaps. */
  private[graft] val RecallPanel: Seq[Long] = (0 until 40).map(i => 1L + 12L * i)

  /** Recall@k of each ANN configuration against the exact brute-force
    * baseline on the same corpus, over the 40-query [[RecallPanel]]: mean
    * over query ids of |ANN top-k ∩ brute top-k| / |brute top-k|. The bench
    * emits this per round (`queries_recall`): wall/cpu/gc/peak-mem catch
    * time and memory regressions, recall@k catches the failure mode those
    * hide — an ANN change that silently stops finding the true neighbors at
    * unchanged speed. Driver-side cost is per-ANN ≤ |panel|·K row collects.
    * All inputs are deterministic (hash planes, seed/k-means centroids,
    * fixed panel), so the values are exact per-dataset constants, not
    * run-to-run statistics. */
  def recallVsBrute(s: org.apache.spark.sql.SparkSession, dir: String,
      annNames: Seq[String] = Seq("q_sim_knn_lsh", "q_sim_knn_lsh_mp",
        "q_sim_knn_ivf", "q_sim_knn_ivf_learned",
        "q_sim_knn_ivf_learned_k64", "q_sim_knn_pq",
        "q_sim_knn_pq_rerank", "q_sim_knn_pq_prod", "q_sim_knn_ivfpq",
        "q_sim_knn_sq8", "q_sim_knn_matryoshka"))
      : Map[String, Double] = {
    def sets(name: String): Map[Long, Set[Long]] =
      AnnCores(name)(s, dir, RecallPanel)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }
    val brute = sets("q_sim_knn_brute")
    annNames.map { n =>
      val ann = sets(n)
      val perQuery = brute.toSeq.map { case (q, b) =>
        ann.getOrElse(q, Set.empty).intersect(b).size.toDouble / b.size }
      n -> perQuery.sum / perQuery.size
    }.toMap
  }

  val defs: Map[String, Q] = Map(

    // Exact top-k cosine neighbors for a fixed query set — the brute-force
    // baseline: broadcast queries, one narrow scan of the corpus.
    "q_sim_knn_brute" -> Q(
      (s, dir) => AnnCores("q_sim_knn_brute")(s, dir, QueryIds)
        .orderBy(col("query_id"), col("neighbor_id")),
      Some(s"""$preparedCte,
              |q AS (
              |  SELECT id AS query_id, v AS qv, nrm AS qn FROM n
              |  WHERE id IN $queryIdList),
              |s AS (
              |  SELECT query_id, id AS neighbor_id,
              |         ${DuckFrag.cosineSql("qv", "qn", "v", "nrm")} AS cosine
              |  FROM n, q WHERE id <> query_id),
              |r AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
              |  FROM s)
              |SELECT query_id, neighbor_id, cosine FROM r WHERE rn <= $K
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    // ANN top-k via the multi-table LSH OR-construction: 4 independent
    // 4-bit signed-random-projection tables; a candidate shares the
    // query's bucket in ANY table (AND-within sharpens precision,
    // OR-across repairs recall — the standard sizing when single-table
    // collision probability is low; see NumTables scaladoc).
    "q_sim_knn_lsh" -> Q(
      (s, dir) => AnnCores("q_sim_knn_lsh")(s, dir, QueryIds)
        .orderBy(col("query_id"), col("neighbor_id")),
      Some {
        val all = Sim.planes(NumTables * BitsPerTable, Dim)
        val cols = (0 until NumTables).map { t =>
          s"${bucketSqlFor("v", all.slice(t * BitsPerTable, (t + 1) * BitsPerTable))} AS b$t"
        }.mkString(", ")
        val anyTable = (0 until NumTables)
          .map(t => s"b.b$t = q.qb$t").mkString("(", " OR ", ")")
        val qcols = (0 until NumTables).map(t => s"b$t AS qb$t").mkString(", ")
        s"""$preparedCte,
           |b AS (SELECT id, v, nrm, $cols FROM n),
           |q AS (
           |  SELECT id AS query_id, v AS qv, nrm AS qn, $qcols
           |  FROM b WHERE id IN $queryIdList),
           |s AS (
           |  SELECT query_id, b.id AS neighbor_id,
           |         ${DuckFrag.cosineSql("qv", "qn", "b.v", "b.nrm")} AS cosine
           |  FROM b, q WHERE $anyTable AND b.id <> query_id),
           |r AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
           |  FROM s)
           |SELECT query_id, neighbor_id, cosine FROM r WHERE rn <= $K
           |ORDER BY query_id, neighbor_id""".stripMargin
      }),

    // Multi-probe LSH ANN: one 9-bit table, probing every bucket within
    // Hamming distance 3 of the query's (130 probes — broadcast query side
    // only; the corpus still joins by bucket equality). Recovers neighbors
    // that fall just across a few hyperplanes, the dominant recall loss of
    // single-bucket LSH — see the MpPlanes scaladoc for the sizing vs the
    // multi-table gate.
    "q_sim_knn_lsh_mp" -> Q(
      (s, dir) => AnnCores("q_sim_knn_lsh_mp")(s, dir, QueryIds)
        .orderBy(col("query_id"), col("neighbor_id")),
      Some {
        val masks = Sim.probeMasks(MpPlanes, MpProbeRadius)
          .map(m => s"xor(bucket, $m)").mkString("[", ", ", "]")
        val mpBucket = bucketSqlFor("v", Sim.planes(MpPlanes, Dim))
        s"""$preparedCte,
           |b AS (SELECT id, v, nrm, $mpBucket AS bucket FROM n),
           |q AS (
           |  SELECT id AS query_id, v AS qv, nrm AS qn,
           |         unnest($masks) AS qbucket
           |  FROM b WHERE id IN $queryIdList),
           |s AS (
           |  SELECT query_id, id AS neighbor_id,
           |         ${DuckFrag.cosineSql("qv", "qn", "v", "nrm")} AS cosine
           |  FROM b, q WHERE bucket = qbucket AND id <> query_id),
           |r AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
           |  FROM s)
           |SELECT query_id, neighbor_id, cosine FROM r WHERE rn <= $K
           |ORDER BY query_id, neighbor_id""".stripMargin
      }),

    // IVF-cell ANN: corpus partitioned by nearest centroid (deterministic
    // seed centroids), queries probe their IvfSeedProbe nearest cells.
    "q_sim_knn_ivf" -> Q(
      (s, dir) => AnnCores("q_sim_knn_ivf")(s, dir, QueryIds)
        .orderBy(col("query_id"), col("neighbor_id")),
      Some(s"""$preparedCte,
              |cent AS (
              |  SELECT id AS cid, v AS cv, nrm AS cnrm FROM n WHERE id < 8),
              |ranked AS (
              |  SELECT n.id, n.v, n.nrm, cent.cid AS cell,
              |         row_number() OVER (PARTITION BY n.id ORDER BY
              |           ${DuckFrag.cosineSql("n.v", "n.nrm", "cent.cv", "cent.cnrm")}
              |             DESC, cent.cid) AS rk
              |  FROM n, cent),
              |assign AS (
              |  SELECT id, v, nrm, cell FROM ranked WHERE rk = 1),
              |q AS (
              |  SELECT id AS query_id, v AS qv, nrm AS qn, cell AS qcell
              |  FROM ranked WHERE rk <= $IvfSeedProbe AND id IN $queryIdList),
              |s AS (
              |  SELECT query_id, id AS neighbor_id,
              |         ${DuckFrag.cosineSql("qv", "qn", "v", "nrm")} AS cosine
              |  FROM assign, q WHERE cell = qcell AND id <> query_id),
              |r AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
              |  FROM s)
              |SELECT query_id, neighbor_id, cosine FROM r WHERE rn <= $K
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    // IVF-cell ANN on LEARNED centroids (deterministic k-means||, the
    // production recall path) with nProbe=2 multi-cell probing. The learned
    // centroids are dumped to a parquet side-table; the oracle recomputes
    // cell assignment, the 2-cell probe list, and top-k from that table —
    // gating the whole scoring pipeline (assign/probe/score/rank) bitwise.
    "q_sim_knn_ivf_learned" -> Q(
      (s, dir) => {
        val (corpus, cents) = ivfTrainOnly(s, dir)
        import s.implicits._
        writeTableAtomically(
          cents.map(c => (c.cid, c.cv.toSeq, c.cnrm)).toDF("cid", "cv", "cnrm"),
          centroidDump(dir))
        Sim.knnIvfFrom(corpus, cents, QueryIds, K, nProbe = IvfLearnedProbe)
          .orderBy(col("query_id"), col("neighbor_id"))
      },
      Some(s"""$preparedCte,
              |cent AS (
              |  SELECT cid, CAST(cv AS DOUBLE[]) AS cv, cnrm
              |  FROM read_parquet('${CentroidDumpBase}sf0.01/*.parquet')),
              |ranked AS (
              |  SELECT n.id, n.v, n.nrm, cent.cid AS cell,
              |         row_number() OVER (PARTITION BY n.id ORDER BY
              |           ${DuckFrag.cosineSql("n.v", "n.nrm", "cent.cv", "cent.cnrm")}
              |             DESC, cent.cid) AS rk
              |  FROM n, cent),
              |assign AS (
              |  SELECT id, v, nrm, cell FROM ranked WHERE rk = 1),
              |q AS (
              |  SELECT id AS query_id, v AS qv, nrm AS qn, cell AS qcell
              |  FROM ranked WHERE rk <= $IvfLearnedProbe
              |    AND id IN $queryIdList),
              |s AS (
              |  SELECT query_id, id AS neighbor_id,
              |         ${DuckFrag.cosineSql("qv", "qn", "v", "nrm")} AS cosine
              |  FROM assign, q WHERE cell = qcell AND id <> query_id),
              |r AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
              |  FROM s)
              |SELECT query_id, neighbor_id, cosine FROM r WHERE rn <= $K
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    // IVF ANN trained at k = LloydBucketedMinK through kmeansDriver's
    // DEFAULT dispatch — every Lloyd round runs the bucketed two-level
    // assignment, the production training path (see K64Cells' scaladoc).
    // Same side-table contract as q_sim_knn_ivf_learned: the trained
    // centroids are dumped to parquet and the oracle replays cell
    // assignment, the min(16, |cents|) probe list, and top-k bitwise.
    "q_sim_knn_ivf_learned_k64" -> Q(
      (s, dir) => {
        val (corpus, cents) = ivfK64TrainOnly(s, dir)
        import s.implicits._
        writeTableAtomically(
          cents.map(c => (c.cid, c.cv.toSeq, c.cnrm)).toDF("cid", "cv", "cnrm"),
          k64Dump(dir))
        Sim.knnIvfFrom(corpus, cents, QueryIds, K,
            nProbe = math.min(K64Probe, cents.size))
          .orderBy(col("query_id"), col("neighbor_id"))
      },
      Some(s"""$preparedCte,
              |cent AS (
              |  SELECT cid, CAST(cv AS DOUBLE[]) AS cv, cnrm
              |  FROM read_parquet('${K64DumpBase}sf0.01/*.parquet')),
              |ranked AS (
              |  SELECT n.id, n.v, n.nrm, cent.cid AS cell,
              |         row_number() OVER (PARTITION BY n.id ORDER BY
              |           ${DuckFrag.cosineSql("n.v", "n.nrm", "cent.cv", "cent.cnrm")}
              |             DESC, cent.cid) AS rk
              |  FROM n, cent),
              |assign AS (
              |  SELECT id, v, nrm, cell FROM ranked WHERE rk = 1),
              |q AS (
              |  SELECT id AS query_id, v AS qv, nrm AS qn, cell AS qcell
              |  FROM ranked
              |  WHERE rk <= least($K64Probe, (SELECT count(*) FROM cent))
              |    AND id IN $queryIdList),
              |s AS (
              |  SELECT query_id, id AS neighbor_id,
              |         ${DuckFrag.cosineSql("qv", "qn", "v", "nrm")} AS cosine
              |  FROM assign, q WHERE cell = qcell AND id <> query_id),
              |r AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
              |  FROM s)
              |SELECT query_id, neighbor_id, cosine FROM r WHERE rn <= $K
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    // Product-quantization ANN, pure ADC: the corpus is stored as m=4
    // one-byte codes per vector and queries score candidates with m table
    // lookups instead of a dim-wide dot product — the memory-compression
    // scale path (100 TB of vectors → a few hundred GB of codes). The
    // trained codebooks are dumped to a parquet side-table; the oracle
    // recomputes encoding, per-query distance tables, and the ADC ranking
    // from it fold-for-fold.
    "q_sim_knn_pq" -> Q(
      (s, dir) => {
        val (corpus, cbs) = pqTrained(s, dir)
        graft.operators.Pq.knnPqFrom(corpus, cbs, QueryIds, K)
          .orderBy(col("query_id"), col("neighbor_id"))
      },
      Some(s"""$preparedCte,
              |$pqCtes
              |SELECT query_id, neighbor_id, adc_dist FROM radc
              |WHERE rn <= $K
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    // PQ-ADC with exact re-rank: the top-⌈2n/5⌉ ADC candidates per query
    // (Pq.rerankBreadth — a FRACTION of the corpus, not a constant) are
    // re-scored with exact cosine (only breadth·|queries| full vectors
    // move, by id-join) — the standard recall repair over pure ADC. Output
    // is exact cosine, so recall failures surface as ranking differences.
    "q_sim_knn_pq_rerank" -> Q(
      (s, dir) => {
        val (corpus, cbs) = pqTrained(s, dir)
        graft.operators.Pq.knnPqFrom(corpus, cbs, QueryIds, K,
            rerank = pqRerankFor(corpus.count()))
          .orderBy(col("query_id"), col("neighbor_id"))
      },
      Some(s"""$preparedCte,
              |$pqCtes,
              |cand AS (
              |  SELECT query_id, neighbor_id FROM radc WHERE rn <= $RerankBreadthSql),
              |ex AS (
              |  SELECT c.query_id, c.neighbor_id,
              |         ${DuckFrag.cosineSql("q.v", "q.nrm", "b.v", "b.nrm")}
              |           AS cosine
              |  FROM cand c
              |  JOIN n b ON b.id = c.neighbor_id
              |  JOIN n q ON q.id = c.query_id),
              |rex AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
              |  FROM ex)
              |SELECT query_id, neighbor_id, cosine FROM rex WHERE rn <= $K
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    // The PRODUCTION PQ operating point, oracle-gated (see PqProdM's
    // scaladoc): m=16/32-cent codebooks + the SUBLINEAR max(8k, ⌈√n⌉)
    // exact re-rank — the configuration whose 10×-growth recall the sf1
    // probe measured flat (0.835→0.840), vs the coarse-codebook gate
    // above whose ⌈2n/5⌉ breadth is gate-only. The oracle recomputes
    // encoding, ADC tables, the sublinear shortlist, and the exact
    // re-rank fold-for-fold from the dumped codebook side-table.
    "q_sim_knn_pq_prod" -> Q(
      (s, dir) => {
        val (corpus, cbs) = pqProdTrained(s, dir)
        graft.operators.Pq.knnPqFrom(corpus, cbs, QueryIds, K,
            rerank = pqProdRerankFor(corpus.count()))
          .orderBy(col("query_id"), col("neighbor_id"))
      },
      Some(s"""$preparedCte,
              |${pqCtesFor(PqProdDumpBase, PqProdM, PqProdSubDim)},
              |cand AS (
              |  SELECT query_id, neighbor_id FROM radc
              |  WHERE rn <= $ProdRerankSql),
              |ex AS (
              |  SELECT c.query_id, c.neighbor_id,
              |         ${DuckFrag.cosineSql("q.v", "q.nrm", "b.v", "b.nrm")}
              |           AS cosine
              |  FROM cand c
              |  JOIN n b ON b.id = c.neighbor_id
              |  JOIN n q ON q.id = c.query_id),
              |rex AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
              |  FROM ex)
              |SELECT query_id, neighbor_id, cosine FROM rex WHERE rn <= $K
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    // IVF-PQ composite (operators.Ivfpq — the faiss-IVFPQ production
    // operating point): coarse cells prune WHICH rows are scored, residual
    // PQ compresses WHAT is scored, exact re-rank repairs the metric. The
    // oracle re-derives cell assignment, unit residuals, codes, per-probe
    // ADC tables, candidate ranking, and the exact re-rank fold-for-fold
    // from the two dumped side-tables (coarse centroids + residual
    // codebooks).
    "q_sim_knn_ivfpq" -> Q(
      (s, dir) => {
        val (corpus, cents, cbs) = ivfpqTrained(s, dir)
        graft.operators.Ivfpq.knnIvfPqFrom(corpus, cents, cbs, QueryIds, K,
            IvfPqProbe, pqRerankFor(corpus.count()))
          .orderBy(col("query_id"), col("neighbor_id"))
      },
      Some {
        val u = DuckFrag.unitSql _
        val rSub = s"list_slice(r.rv, cb.sub*$IvfPqSubDim + 1, " +
          s"cb.sub*$IvfPqSubDim + $IvfPqSubDim)"
        val qSub = s"list_slice(r.rq, cb.sub*$IvfPqSubDim + 1, " +
          s"cb.sub*$IvfPqSubDim + $IvfPqSubDim)"
        s"""$preparedCte,
           |cc AS (
           |  SELECT cid, CAST(cv AS DOUBLE[]) AS cv, cnrm
           |  FROM read_parquet('${IvfPqCentDumpBase}sf0.01/*.parquet')),
           |cb AS (
           |  SELECT sub, cid, CAST(cv AS DOUBLE[]) AS cv
           |  FROM read_parquet('${IvfPqCbDumpBase}sf0.01/*.parquet')),
           |asg AS (
           |  SELECT id, cid AS cell, cu FROM (
           |    SELECT n.id, cc.cid,
           |      list_transform(cc.cv, x ->
           |        CASE WHEN cc.cnrm > 0 THEN x / cc.cnrm ELSE x END) AS cu,
           |      row_number() OVER (PARTITION BY n.id
           |        ORDER BY ${DuckFrag.cosineSql("n.v", "n.nrm", "cc.cv", "cc.cnrm")}
           |          DESC, cc.cid) AS rk
           |    FROM n, cc) WHERE rk = 1),
           |res AS (
           |  SELECT n.id, a.cell,
           |    list_transform(range(1, $Dim + 1), i ->
           |      ${u("n.v", "n.nrm", "i")} - a.cu[i]) AS rv
           |  FROM n JOIN asg a USING (id)),
           |dist AS (
           |  SELECT r.id, cb.sub, cb.cid,
           |         ${DuckFrag.l2sqSql(rSub, "cb.cv")} AS d
           |  FROM res r, cb),
           |codes AS (
           |  SELECT id, list(cid ORDER BY sub) AS codes FROM (
           |    SELECT id, sub, cid, row_number() OVER (
           |      PARTITION BY id, sub ORDER BY d, cid) AS rk FROM dist)
           |  WHERE rk = 1 GROUP BY id),
           |qp AS (
           |  SELECT query_id, cell, cu FROM (
           |    SELECT n.id AS query_id, cc.cid AS cell,
           |      list_transform(cc.cv, x ->
           |        CASE WHEN cc.cnrm > 0 THEN x / cc.cnrm ELSE x END) AS cu,
           |      row_number() OVER (PARTITION BY n.id
           |        ORDER BY ${DuckFrag.cosineSql("n.v", "n.nrm", "cc.cv", "cc.cnrm")}
           |          DESC, cc.cid) AS rk
           |    FROM n, cc WHERE n.id IN $queryIdList) t
           |  WHERE rk <= $IvfPqProbe),
           |qres AS (
           |  SELECT q.query_id, q.cell,
           |    list_transform(range(1, $Dim + 1), i ->
           |      ${u("n.v", "n.nrm", "i")} - q.cu[i]) AS rq
           |  FROM qp q JOIN n ON n.id = q.query_id),
           |qdist AS (
           |  SELECT r.query_id, r.cell, cb.sub, cb.cid,
           |         ${DuckFrag.l2sqSql(qSub, "cb.cv")} AS d
           |  FROM qres r, cb),
           |qt AS (
           |  SELECT query_id, cell, sub, list(d ORDER BY cid) AS tab
           |  FROM qdist GROUP BY 1, 2, 3),
           |qtab AS (
           |  SELECT query_id, cell, list(tab ORDER BY sub) AS qtab
           |  FROM qt GROUP BY 1, 2),
           |adc AS (
           |  SELECT q.query_id, cd.id AS neighbor_id,
           |    list_reduce(list_prepend(0.0, list_transform(
           |      range(1, $IvfPqM + 1), s -> q.qtab[s][cd.codes[s] + 1])),
           |      (acc, x) -> acc + x) AS adc_dist
           |  FROM codes cd JOIN asg a USING (id)
           |  JOIN qtab q ON a.cell = q.cell
           |  WHERE cd.id <> q.query_id),
           |radc AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) rn
           |  FROM adc),
           |cand AS (
           |  SELECT query_id, neighbor_id FROM radc
           |  WHERE rn <= $RerankBreadthSql),
           |ex AS (
           |  SELECT c.query_id, c.neighbor_id,
           |         ${DuckFrag.cosineSql("q.v", "q.nrm", "b.v", "b.nrm")}
           |           AS cosine
           |  FROM cand c
           |  JOIN n b ON b.id = c.neighbor_id
           |  JOIN n q ON q.id = c.query_id),
           |rex AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
           |  FROM ex)
           |SELECT query_id, neighbor_id, cosine FROM rex WHERE rn <= $K
           |ORDER BY query_id, neighbor_id""".stripMargin
      }),

    // Int8 scalar-quantization ANN: per-dim [min,max] ranges over the
    // NORMALIZED corpus, 0..255 codes, integer squared-L2 ranking — the
    // first rung of the memory ladder (64 B/vector, no codebook training).
    // Everything is exact (min/max ranges, single-rounded IEEE code
    // arithmetic, BIGINT distances), so the oracle re-derives ranges,
    // codes, and ranking from the data alone — no side-table, no pinned
    // scale, unlike the k-means-trained IVF/PQ gates.
    "q_sim_knn_sq8" -> Q(
      (s, dir) => AnnCores("q_sim_knn_sq8")(s, dir, QueryIds)
        .orderBy(col("query_id"), col("neighbor_id")),
      Some(s"""$preparedCte,
              |mm AS (
              |  SELECT i, min(${DuckFrag.unitSql("v", "nrm", "i")}) AS mn,
              |         max(${DuckFrag.unitSql("v", "nrm", "i")}) AS mx
              |  FROM n, range(1, $Dim + 1) t(i) GROUP BY i),
              |rg AS (
              |  SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
              |  FROM mm),
              |codes AS (
              |  SELECT id, list_transform(range(1, $Dim + 1), i ->
              |    CASE WHEN mxs[i] = mns[i] THEN CAST(0 AS BIGINT)
              |         ELSE least(greatest(CAST(floor((${DuckFrag.unitSql("v", "nrm", "i")} - mns[i])
              |           * 255.0 / (mxs[i] - mns[i])) AS BIGINT), 0), 255)
              |    END) AS c
              |  FROM n, rg),
              |sqd AS (
              |  SELECT q.id AS query_id, c.id AS neighbor_id,
              |         list_reduce(list_prepend(CAST(0 AS BIGINT),
              |           list_transform(range(1, $Dim + 1),
              |             i -> (q.c[i] - c.c[i]) * (q.c[i] - c.c[i]))),
              |           (acc, x) -> acc + x) AS sq_dist
              |  FROM codes c, codes q
              |  WHERE q.id IN $queryIdList AND c.id <> q.id),
              |rs AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY sq_dist, neighbor_id) rn
              |  FROM sqd)
              |SELECT query_id, neighbor_id, sq_dist FROM rs WHERE rn <= $K
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    // Embedding near-dup DECISIONS: the LSH-bucketed pair set resolved to
    // connected components (min-id keeper per component) — the embedding
    // analog of q_pipe_dup_groups, composing Similarity's candidate
    // generation with Dedup's component resolution end-to-end. The oracle
    // replays components with a recursive CTE over the same pair SQL.
    "q_sim_neardup_groups" -> Q(
      (s, dir) => {
        val corpus = Sim.withBuckets(
          Sim.prepared(tbl(s, dir, "embeddings"), "embedding", "vec_id"),
          Sim.planes(NumPlanes, Dim))
        val pairs = corpus.as("a").join(corpus.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
          .filter(Sim.cosine(col("a.v"), col("a.nrm"), col("b.v"),
            col("b.nrm")) >= 0.3)
          .select(col("a.id").as("id1"), col("b.id").as("id2"))
        graft.operators.Dedup.dupGroups(pairs).orderBy(col("id"))
      },
      Some(s"""WITH RECURSIVE p AS (
              |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
              |  FROM embeddings),
              |n AS (
              |  SELECT id, v, sqrt(${DuckFrag.dotSql("v", "v")}) AS nrm FROM p),
              |bk AS (SELECT id, v, nrm, ${bucketSql("v")} AS bucket FROM n),
              |pairs AS MATERIALIZED (
              |  SELECT x.id AS id1, y.id AS id2
              |  FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.id < y.id
              |  WHERE ${DuckFrag.cosineSql("x.v", "x.nrm", "y.v", "y.nrm")} >= 0.3),
              |edges AS (
              |  SELECT id1 AS a, id2 AS b FROM pairs
              |  UNION ALL SELECT id2, id1 FROM pairs),
              |${DuckFrag.componentCtes}
              |SELECT id, keeper FROM comp
              |ORDER BY id""".stripMargin)),

    // SemDeDup (Abbas et al. 2023): k-means cells bound the pairwise
    // cosine kernel to |cell|² per cell; within-cell components keep their
    // min-id row. One decision record per embedding — the semantic
    // complement of the text-side q_pipe_dedup_* family. The learned
    // centroids go to a parquet side-table so DuckDB replays assignment,
    // pair generation, and the component fold from the same cluster set.
    "q_sim_semdedup" -> Q(
      (s, dir) => {
        val corpus = preparedCorpus(s, dir)
        val cents = Sim.kmeansCentroidsSeq(corpus, k = 8, lloydIters = 2)
        import s.implicits._
        writeTableAtomically(
          cents.map(c => (c.cid, c.cv.toSeq, c.cnrm)).toDF("cid", "cv", "cnrm"),
          semDump(dir))
        Sim.semDedupDecisions(corpus, cents, SemThreshold)
          .orderBy(col("id"))
      },
      Some(semDedupOracleSql(SemDumpBase))),

    // SemDeDup with the SCALE-SAFE defaults: k is derived from the corpus
    // count (k = ceil(n / targetCellSize)) instead of pinned by the
    // caller, so the intra-cell pair kernel stays linear in n — the fix
    // for the fixed-k gate's measured 22.3x blow-up at 10x data. Cell
    // assignment (Lloyd rounds AND the final pass) is BUCKETED: top-4
    // coarse groups by cosine, argmax over just their members — n·O(√k)
    // instead of the flat fold's n·k = n²/targetCellSize, the term the
    // sf1 probe measured at ×4.6 at the demo cell size. The derived
    // centroids ride to the oracle WITH their gid, the coarse group
    // centers get their own side-table, and the oracle replays the
    // identical two-level rule (rank groups by cos DESC/gid, argmax over
    // the probed members) — so the gate pins the production algorithm
    // itself, not a simplified stand-in.
    "q_sim_semdedup_auto" -> Q(
      (s, dir) => {
        val corpus = preparedCorpus(s, dir)
        val model = Sim.semDedupAuto(corpus, SemThreshold, SemAutoCell)
        import s.implicits._
        writeTableAtomically(
          model.cents.map(c =>
              (c.cid, c.cv.toSeq, c.cnrm, model.cidToGid(c.cid)))
            .toDF("cid", "cv", "cnrm", "gid"),
          semAutoDump(dir))
        writeTableAtomically(
          model.groups.map(g => (g.gid, g.gv.toSeq, g.gn))
            .toDF("gid", "gv", "gn"),
          semAutoGroupsDump(dir))
        model.decisions.orderBy(col("id"))
      },
      Some(semDedupBucketedOracleSql(SemAutoDumpBase, SemAutoGroupsBase,
        Sim.GroupProbes))),

    // kNN label classification over the exact top-k neighbors: majority
    // vote of the neighbors' labels (ties break to the smallest label) —
    // the label-propagation step a training pipeline runs to extend a
    // small labeled seed set over an unlabeled corpus (fastText-style
    // quality classifiers). Scale shape: the k·|queries| candidate set
    // broadcasts into the label join; the corpus side never shuffles.
    "q_sim_knn_classify" -> Q(
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        val nn = Sim.knnBrute(emb, "embedding", "vec_id", QueryIds, K)
        val votes = broadcast(nn.select(col("query_id"), col("neighbor_id")))
          .join(emb.select(col("vec_id").as("neighbor_id"), col("label")),
            "neighbor_id")
          .groupBy(col("query_id"), col("label"))
          .agg(count(lit(1)).as("votes"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("votes").desc, col("label"))
        votes.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("query_id"), col("label").as("pred_label"),
            col("votes"))
          .orderBy(col("query_id"))
      },
      Some(s"""$preparedCte,
              |q AS (
              |  SELECT id AS query_id, v AS qv, nrm AS qn FROM n
              |  WHERE id IN $queryIdList),
              |sc AS (
              |  SELECT query_id, id AS neighbor_id,
              |         ${DuckFrag.cosineSql("qv", "qn", "v", "nrm")} AS cosine
              |  FROM n, q WHERE id <> query_id),
              |r AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
              |  FROM sc),
              |v AS (
              |  SELECT query_id, e.label, count(*) AS votes
              |  FROM r JOIN embeddings e ON e.vec_id = r.neighbor_id
              |  WHERE rn <= $K GROUP BY query_id, e.label),
              |w AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY votes DESC, label) wrn
              |  FROM v)
              |SELECT query_id, label AS pred_label, votes FROM w
              |WHERE wrn = 1 ORDER BY query_id""".stripMargin)),

    // Embedding near-dup pairs, LSH-bucketed: pairs sharing a bucket with
    // cosine ≥ τ. The bucket equi-join keeps the pair space ~n²/2^planes —
    // the scale path; raw all-pairs stays an explicitly-opt-in API.
    "q_sim_neardup_lsh" -> Q(
      (s, dir) => {
        val corpus = Sim.prepared(tbl(s, dir, "embeddings"), "embedding",
            "vec_id")
          .withColumn("bucket", Sim.lshBucket(col("v"),
            Sim.planes(NumPlanes, Dim)))
        corpus.as("a").join(corpus.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id1"), col("b.id").as("id2"),
            Sim.cosine(col("a.v"), col("a.nrm"), col("b.v"), col("b.nrm"))
              .as("cosine"))
          .filter(col("cosine") >= 0.3)
          .orderBy(col("id1"), col("id2"))
      },
      Some(s"""$preparedCte,
              |bk AS (SELECT id, v, nrm, ${bucketSql("v")} AS bucket FROM n)
              |SELECT x.id AS id1, y.id AS id2,
              |       ${DuckFrag.cosineSql("x.v", "x.nrm", "y.v", "y.nrm")}
              |         AS cosine
              |FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.id < y.id
              |WHERE ${DuckFrag.cosineSql("x.v", "x.nrm", "y.v", "y.nrm")} >= 0.3
              |ORDER BY id1, id2""".stripMargin)),

    // Matryoshka / adaptive retrieval (Kusupati et al. 2022): the full
    // corpus scan scores only the first MatPrefixDim of Dim embedding
    // dims (MRL models front-load information), keeps an 8·K shortlist by
    // prefix cosine, and re-ranks the shortlist with the exact full-dim
    // cosine — ½ the scan FLOPs/bytes at a shortlist that is a small
    // multiple of K, not a corpus fraction (the operating-point contrast
    // with q_sim_knn_pq_rerank). The oracle re-derives prefix slices,
    // prefix norms, shortlist, and the exact re-rank fold-for-fold from
    // the data alone — no side-table.
    "q_sim_knn_matryoshka" -> Q(
      (s, dir) => AnnCores("q_sim_knn_matryoshka")(s, dir, QueryIds)
        .orderBy(col("query_id"), col("neighbor_id")),
      Some(s"""$preparedCte,
              |pp AS (
              |  SELECT id, v, nrm, list_slice(v, 1, $MatPrefixDim) AS pv
              |  FROM n),
              |p2 AS (
              |  SELECT id, v, nrm, pv,
              |         sqrt(${DuckFrag.dotSql("pv", "pv")}) AS pn
              |  FROM pp),
              |q AS (
              |  SELECT id AS query_id, pv AS qpv, pn AS qpn FROM p2
              |  WHERE id IN $queryIdList),
              |s AS (
              |  SELECT query_id, id AS neighbor_id,
              |         ${DuckFrag.cosineSql("qpv", "qpn", "pv", "pn")} AS pcos
              |  FROM p2, q WHERE id <> query_id),
              |r AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY pcos DESC, neighbor_id) rn
              |  FROM s),
              |cand AS (
              |  SELECT query_id, neighbor_id FROM r
              |  WHERE rn <= $MatShortlistSql),
              |ex AS (
              |  SELECT c.query_id, c.neighbor_id,
              |         ${DuckFrag.cosineSql("qq.v", "qq.nrm", "b.v", "b.nrm")}
              |           AS cosine
              |  FROM cand c
              |  JOIN n b ON b.id = c.neighbor_id
              |  JOIN n qq ON qq.id = c.query_id),
              |rex AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn
              |  FROM ex)
              |SELECT query_id, neighbor_id, cosine FROM rex WHERE rn <= $K
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    // Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009) of a
    // LEXICAL shortlist (integer term-frequency ranking over the fixed
    // query terms — the ranking-ulp rule forbids ranking on ln-based BM25
    // doubles cross-engine) with the VECTOR shortlist (exact cosine
    // top-50). Ranks are the exchange currency: the fused score is two
    // IEEE divisions and one add on integers, bit-identical in any
    // engine. The lexical top-50 is a TakeOrdered + bounded 50-row
    // driver collect (rank literals broadcast back) — a global
    // row_number window over corpus-cardinality input would funnel one
    // partition, which the plan guard bans.
    "q_hybrid_rrf" -> Q(
      (s, dir) => {
        import s.implicits._
        val emb = tbl(s, dir, "embeddings")
        val nn = Sim.knnBrute(emb, "embedding", "vec_id", QueryIds,
          RrfShortlist)
        val wv = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))
        val vec = nn.withColumn("rank",
            org.apache.spark.sql.functions.row_number().over(wv))
          .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
        val isTerm = (t: org.apache.spark.sql.Column) =>
          RrfTerms.map(x => t === x).reduce(_ || _)
        val lexAll = tbl(s, dir, "documents")
          .select(col("doc_id").as("id"),
            size(filter(split(col("text"), " "), isTerm)).cast("long")
              .as("tf"))
          .filter(col("tf") > 0)
        val top = lexAll.orderBy(col("tf").desc, col("id"))
          .limit(RrfShortlist).collect()
        val ranks = top.map(r => (r.getLong(0), r.getLong(1)))
          .sortBy { case (id, tf) => (-tf, id) }
          .zipWithIndex.map { case ((id, _), i) => (id, (i + 1).toLong) }
        val lex = broadcast(ranks.toSeq.toDF("id", "rank"))
          .crossJoin(broadcast(QueryIds.toDF("query_id")))
          .select(col("query_id"), col("id"), col("rank"))
        Sim.rrfFuse(lex, vec, RrfTopK)
          .select(col("query_id"), col("id"), col("ra").as("lex_rank"),
            col("rb").as("vec_rank"), col("rrf"))
          .orderBy(col("query_id"), col("id"))
      },
      Some(s"""$preparedCte,
              |q AS (
              |  SELECT id AS query_id, v AS qv, nrm AS qn FROM n
              |  WHERE id IN $queryIdList),
              |sc AS (
              |  SELECT query_id, id AS neighbor_id,
              |         ${DuckFrag.cosineSql("qv", "qn", "v", "nrm")} AS cosine
              |  FROM n, q WHERE id <> query_id),
              |vr AS (
              |  SELECT query_id, neighbor_id AS id, row_number() OVER (
              |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
              |    AS rank
              |  FROM sc),
              |vtop AS (SELECT * FROM vr WHERE rank <= $RrfShortlist),
              |lex AS (
              |  SELECT doc_id AS id,
              |         CAST(len(list_filter(string_split(text, ' '),
              |           t -> t IN ${RrfTerms.mkString("('", "', '", "')")}))
              |           AS BIGINT) AS tf
              |  FROM documents),
              |ltop0 AS (
              |  SELECT id, tf FROM lex WHERE tf > 0
              |  ORDER BY tf DESC, id LIMIT $RrfShortlist),
              |ltop AS (
              |  SELECT id, row_number() OVER (ORDER BY tf DESC, id) AS rank
              |  FROM ltop0),
              |lq AS (
              |  -- the SAME literal id set the Spark side cross-joins:
              |  -- deriving it from vtop would drop a query with zero
              |  -- vector-shortlist rows (degenerate corpus) that Spark
              |  -- still emits lexical-only fused rows for
              |  SELECT qq.query_id, l.id, l.rank
              |  FROM ltop l,
              |    (SELECT unnest(ARRAY$queryIdArraySql::BIGINT[])
              |       AS query_id) qq),
              |f AS (
              |  SELECT coalesce(a.query_id, b.query_id) AS query_id,
              |         coalesce(a.id, b.id) AS id,
              |         a.rank AS lex_rank, b.rank AS vec_rank,
              |         coalesce(1.0 / (60 + a.rank), 0.0)
              |           + coalesce(1.0 / (60 + b.rank), 0.0) AS rrf
              |  FROM lq a FULL OUTER JOIN vtop b
              |    ON a.query_id = b.query_id AND a.id = b.id),
              |r AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY rrf DESC, id) rn
              |  FROM f)
              |SELECT query_id, id, lex_rank, vec_rank, rrf FROM r
              |WHERE rn <= $RrfTopK ORDER BY query_id, id""".stripMargin))
  )
}
