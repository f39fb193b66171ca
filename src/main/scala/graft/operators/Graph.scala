package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph reductions over an edge list — the analysis layer on
  * top of the similarity graphs the dedup operators emit (MinHash pairs,
  * ED-1 fuzzy pairs). Connected components live in [[Dedup]]; this hosts
  * the local-structure side.
  */
object Graph {

  /** Per-node triangle counts over canonically-oriented edges
    * (`src < dst` per row, no duplicates — exactly what
    * [[Fuzzy.edSelfJoin]] and [[Dedup]] pair outputs produce). The
    * node-iterator join: wedges a<b<c from (a,b)⨝(b,c), closed by an
    * (a,c) edge probe — two hash joins, each triangle found exactly once.
    *
    * Scale note: id-orientation bounds the wedge fan-out by per-node
    * out-degree under the id order; the textbook refinement for skewed
    * graphs re-orients edges by DEGREE (low→high, ids as tie-break),
    * which caps the join fan-out at O(m^1.5) total wedges — same plan
    * shape, one extra degree-aggregate + relabel pass. The similarity
    * graphs this serves are near-dup clusters (bounded components), where
    * id-orientation is already fine. */
  def triangleCounts(edges: DataFrame, src: String, dst: String): DataFrame = {
    // Persisted via the bounded OpCaches registry: the wedge+closure plan
    // references e from THREE sides, and the edge lists this serves come
    // out of expensive pair generators (levenshtein self-joins, MinHash
    // banding) that would otherwise run three times per action (guide §5).
    // The registry bounds the frame's lifetime (r19 verdict: a bare
    // persist here had no unpersist path) and gives the bench its
    // cold-sample hook.
    val e = OpCaches.cached(edges.select(col(src).as("a"), col(dst).as("b")))
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.b") === col("bc.a"))
      .join(e.as("ac"),
        col("ac.a") === col("ab.a") && col("ac.b") === col("bc.b"))
      .select(col("ab.a").as("x"), col("ab.b").as("y"), col("bc.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_tri"))
  }

  /** Fixed-point integer PageRank over an UNDIRECTED canonical edge list
    * (`src < dst` per row — the dedup/fuzzy pair shape): each edge carries
    * rank both ways. Ranks are scaled integers (`scale` = 1 unit of total
    * mass ≈ 10¹²), damping 0.85 applied as `(85·s) div 100` — every
    * operation is 64-bit integer arithmetic, so the per-node contribution
    * sums are ORDER-FREE (exact under any partitioning / AQE re-plan) and
    * bit-identical across engines, unlike a double PageRank whose
    * reduction order perturbs the last ulp run to run. The float algorithm
    * converges the same way; fixed-point just rounds deterministically
    * (truncation loses < iters·deg ulps of 10⁻¹² — noise at ranking
    * granularity).
    *
    * Each iteration is one shuffle join (rank → contributions along edges)
    * + one keyed aggregate — the standard distributed PageRank shape. The
    * node count is ONE bounded driver long (same class as
    * [[Positional.withGlobalPos]]'s split collect). For production
    * many-iteration runs, persist/checkpoint `r` between iterations to
    * truncate lineage (the 3-iteration analytic gate stays declarative).
    * Isolated nodes (no edges) are absent by construction — every node in
    * the edge list has degree ≥ 1, so the inner joins drop nothing. */
  def pageRankFixedPoint(edges: DataFrame, src: String, dst: String,
      iters: Int = 3, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "pageRankFixedPoint needs at least one iteration")
    val e0 = edges.select(col(src).as("a"), col(dst).as("b"))
    // Persisted via the bounded OpCaches registry (r19/r20): e feeds the
    // degree aggregate plus one join PER ITERATION, and deg feeds the
    // count plus one join per iteration — an unpersisted lineage re-ran
    // the upstream pair generator (a levenshtein self-join in the gate)
    // 4+ times per action. Integer ranks are order-free, so caching
    // changes nothing but the work; the registry bounds the lifetime.
    val e = OpCaches.cached(
      e0.union(e0.select(col("b").as("a"), col("a").as("b"))))
    val deg = OpCaches.cached(e.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg")))
    val n = deg.count()
    // empty graph → empty ranking (flows through adversarial empty-input
    // layouts without a driver-side divide-by-zero)
    if (n == 0) return deg.select(col("node"), lit(scale).as("r"))
    val r0 = scale / n
    val teleport = (15L * r0) / 100L
    var r = deg.select(col("node"), col("deg"), lit(r0).as("r"))
    for (_ <- 1 to iters) {
      val s = e.join(r, e("a") === r("node"))
        .select(col("b").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      r = deg.join(s, "node")
        .select(col("node"), col("deg"),
          (lit(teleport) + expr("(85 * s) div 100")).as("r"))
    }
    r.select(col("node"), col("r"))
  }
}
