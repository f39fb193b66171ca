package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Pmod}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Mechanical 100TB-scale guards over EVERY declared query plan: the
  * single-partition funnels and accidental cross products that are invisible
  * at sf0.01 but fatal on a real cluster can never regress silently.
  */
class PlanGuardSpec extends SparkTestBase {

  // Queries that intentionally broadcast-nested-loop (documented quadratic /
  // broadcast-by-design kernels — the broadcast side is tiny by
  // construction, so the "nested loop" is a scan × constant):
  //   q_sim_knn_brute / _sq8 / _pq / _pq_rerank — the deliberate
  //     brute-scan ANN family: the query set (a handful of ids, their
  //     codes/vectors) broadcasts and the corpus scans once; the non-equi
  //     condition (id =!= query_id) is what forces BNLJ, and that is the
  //     design — the corpus side never shuffles.
  //   q_pipe_tfidf — crossJoin(broadcast(n_docs)): a 1-row global count
  //     attached to every row.
  //   q_sim_knn_classify — majority vote OVER q_sim_knn_brute's output:
  //     inherits the same broadcast-query BNLJ scan.
  //   q_bm25 — crossJoin(broadcast(stats)): a 1-row global
  //     (n_docs, sum_dl) aggregate attached to every candidate row — the
  //     same shape as q_pipe_tfidf's n_docs attach.
  //   q_pipe_ppmi — crossJoin(broadcast(n)): the 1-row total-cooccurrence
  //     aggregate attached to every surviving pair — same shape again.
  //   q_benford — crossJoin(broadcast(total)): a 1-row count attached to
  //     the 9-row digit table.
  //   q_pipe_decontam_bloom — crossJoin(broadcast(stats)): the 1-row
  //     (missed, fp_count) invariant aggregate attached to every survivor
  //     row — same shape as q_pipe_tfidf's n_docs attach.
  //   q_sim_knn_matryoshka — the same broadcast-query non-equi scan as
  //     q_sim_knn_brute, scoring only the dim prefix.
  //   q_sim_knn_pq_prod — knnPqFrom's broadcast-query ADC scan (the
  //     id =!= query_id non-equi condition, same as _pq/_pq_rerank) at
  //     the production m=16/32-cent codebook; the corpus side never
  //     shuffles and the re-rank fetch is a sublinear id-equi-join.
  //   q_hybrid_rrf — inherits q_sim_knn_brute's scan for its vector
  //     shortlist, plus a 50-row-literal x 4-query-id crossJoin of two
  //     broadcasts (both sides constant-bounded).
  private val bnljAllowed = Set("q_sim_knn_brute", "q_sim_knn_sq8",
    "q_sim_knn_pq", "q_sim_knn_pq_rerank", "q_sim_knn_pq_prod",
    "q_pipe_tfidf", "q_sim_knn_classify", "q_bm25", "q_pipe_ppmi",
    "q_benford", "q_pipe_decontam_bloom", "q_sim_knn_matryoshka",
    "q_hybrid_rrf")

  private def plans: Seq[(String, org.apache.spark.sql.DataFrame)] = {
    // AQE wraps the physical plan in AdaptiveSparkPlanExec (opaque to
    // collect); inspect the statically-planned tree instead. The
    // executedPlan MUST be forced while AQE is still off — it is a lazy
    // val, so forcing it after the finally restores the conf would cache
    // the adaptive wrapper and silently vacuate every physical-plan
    // assertion downstream (exactly what happened to the BNLJ guard).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries.toSeq.sortBy(_._1)
      .map { case (n, fn) =>
        val df = fn(spark, sf0001)
        df.queryExecution.executedPlan
        n -> df
      }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("no unpartitioned Window.orderBy in any optimized plan") {
    // A global window is only fatal over full-cardinality input. But NOT
    // every Aggregate child reduces: a groupBy on a full-cardinality key
    // reduces nothing. Exempt only aggregates with PROVABLY bounded
    // grouping: empty grouping (global aggregate → ≤ 1 row) or the
    // global-position bucket pattern (__gp_b has ≤ shuffle-partitions + 1
    // distinct values by construction — a sum of ≤ n split indicators).
    @scala.annotation.tailrec
    def reduced(p: LogicalPlan): Boolean = p match {
      case a: Aggregate =>
        a.groupingExpressions.isEmpty ||
          (a.groupingExpressions.size == 1 &&
            a.aggregateExpressions.exists(_.name == "__gp_b"))
      case p: Project => reduced(p.child)
      case f: Filter => reduced(f.child)
      case _ => false
    }
    // A window "partitioned" by an expression that is constant for every
    // row (pmod(x, 1) ≡ 0, or an expression referencing no columns) is a
    // global window in disguise — it funnels the table through ONE reducer
    // while evading the partitionSpec.isEmpty check above. Flag those too;
    // the same reduced-child exemption applies (the one legitimate use,
    // Positional's bounded ≤ n+1-row offsets aggregate, passes through it).
    def constantValued(e: Expression): Boolean = e match {
      case Pmod(_, Literal(v, _), _) if v != null && v.toString == "1" => true
      case _ => e.references.isEmpty
    }
    for ((name, df) <- plans) {
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: Window if w.orderSpec.nonEmpty &&
          (w.partitionSpec.isEmpty ||
            w.partitionSpec.forall(constantValued)) &&
          !reduced(w.child) => w
      }
      assert(bad.isEmpty,
        s"$name funnels the table through one partition via a global (or " +
          s"constant-partitioned) Window")
    }
  }

  test("single-partition shuffles only below final global aggregates/limits") {
    // the exchange's NEAREST interesting input must be the reducer — a deep
    // subtree `exists` would excuse an aggregate that a later join/explode
    // re-expanded back to full cardinality
    @scala.annotation.tailrec
    def reducerFeeds(p: SparkPlan): Boolean = p match {
      case _: BaseAggregateExec => true
      case x if x.nodeName.toLowerCase.contains("limit") => true
      case x if x.children.size == 1 &&
          (x.nodeName.contains("Project") || x.nodeName.contains("Sort") ||
            x.nodeName.contains("WholeStageCodegen") ||
            x.nodeName.contains("InputAdapter") ||
            x.nodeName.contains("ColumnarToRow")) =>
        reducerFeeds(x.children.head)
      case _ => false
    }
    for ((name, df) <- plans) {
      val plan = df.queryExecution.executedPlan
      val offenders = plan.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1
            && !reducerFeeds(e.child) => e
      }
      assert(offenders.isEmpty,
        s"$name has a single-partition Exchange over unreduced data:\n" +
          offenders.mkString("\n"))
    }
  }

  test("filters and projections reach the parquet scan") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q_filter_project")(spark, sf0001)
      val scan = df.queryExecution.executedPlan.toString
      // predicate pushdown: both filters appear as PushedFilters
      assert(scan.contains("PushedFilters") &&
        scan.contains("GreaterThan(l_quantity") &&
        scan.contains("LessThan(l_discount"), scan)
      // column pruning: untouched wide columns are not read
      assert(!scan.contains("l_comment") && !scan.contains("l_shipmode"), scan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dimension joins broadcast; aggregates are partial-final") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val join = SparkEntry.queries("q_join_broadcast")(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(join.contains("BroadcastHashJoin"), join)
      val agg = SparkEntry.queries("q1_agg")(spark, sf0001)
        .queryExecution.executedPlan.toString
      // partial (map-side) aggregation before the exchange
      assert(agg.contains("partial_"), agg)
      assert(agg.contains("*(1)"), agg)  // "*(n)" = whole-stage codegen span
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("decontamination broadcasts the eval gram set, never the train side") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_pipe_decontam")(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      // per-doc overlap count partial-aggregates before its exchange
      assert(plan.contains("partial_count"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("repetition signals shuffle gram hashes, not text") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exec = SparkEntry.queries("q_pipe_repetition")(spark, sf0001)
        .queryExecution.executedPlan
      // every shuffle carries only longs/ints (doc_id, gram hash, counts /
      // partial-agg buffers) — the document text column never leaves a
      // map-side projection
      val shuffles = exec.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty)
      for (e <- shuffles; attr <- e.child.output)
        assert(!attr.dataType.typeName.contains("string"),
          s"text-typed column ${attr.name} travels through a shuffle:\n$e")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dup-span coverage shuffles fixed-width tuples only, never text") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exec = SparkEntry.queries("q_pipe_dup_spans")(spark, sf0001)
        .queryExecution.executedPlan
      // gram doc-frequency agg, flagged-gram join, coverage window, final
      // doc join: every exchange carries (long, int) tuples — the text
      // column dies in a map-side projection right after hashing
      val shuffles = exec.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty)
      for (e <- shuffles; attr <- e.child.output)
        assert(!attr.dataType.typeName.contains("string"),
          s"text-typed column ${attr.name} travels through a shuffle:\n$e")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("PII redaction is one codegen span over the scan — no shuffle") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exec = SparkEntry.queries("q_pipe_pii_redact")(spark, sf0001)
        .queryExecution.executedPlan
      // the ORDER BY adds a range-exchange at the very top; below it the
      // count/redact pipeline must be shuffle-free narrow codegen
      val shuffles = exec.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size <= 1, s"extra shuffles in a narrow projection:\n$exec")
      // toString renders codegen spans as "*(n)" prefixes, so match the node
      // itself, not the tree string
      val codegenSpans = exec.collect {
        case p: org.apache.spark.sql.execution.WholeStageCodegenExec => p
      }
      assert(codegenSpans.nonEmpty, exec.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("shard/pack shuffle ids and counts only — one hash exchange, no text") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try for (q <- Seq("q_pipe_shard", "q_pipe_pack")) {
      val exec = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan
      val shuffles = exec.collect { case e: ShuffleExchangeExec => e }
      // exactly: the shard-key hash exchange + the gate's final ORDER BY
      assert(shuffles.size <= 2, s"$q: extra exchanges:\n$exec")
      for (e <- shuffles; attr <- e.child.output)
        assert(!attr.dataType.typeName.contains("string"),
          s"$q: text-typed column ${attr.name} travels through a shuffle")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("segment-dedup election shuffles longs; text moves only keyed by " +
      "doc for reassembly") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exec = SparkEntry.queries("q_pipe_seg_dedup")(spark, sf0001)
        .queryExecution.executedPlan
      val shuffles = exec.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty)
      for (e <- shuffles
           if e.child.output.exists(_.dataType.typeName.contains("string"))) {
        // any text-bearing exchange must be the per-doc reassembly
        // (hash on doc_id — bounded by OUTPUT size) or the final ORDER BY;
        // the first-occurrence ELECTION (keyed by segment hash) must stay
        // fixed-width
        val part = e.outputPartitioning.toString
        assert(part.contains("doc_id"),
          s"text crosses a non-doc-keyed exchange ($part):\n$e")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("word-rank: exact vocab ranking without a global-sort window, " +
      "per-doc sums partial below their exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q_pipe_word_rank")(spark, sf0001)
      // the unpartitioned-window guard above already rejects a global rank
      // window; additionally pin that the rank join's per-doc sum is
      // partial-final (map-side collapse before the doc shuffle)
      val aggs = df.queryExecution.executedPlan.collect {
        case a: BaseAggregateExec => a.aggregateExpressions.map(_.mode)
      }.flatten
      assert(aggs.exists(_.toString.contains("Partial")),
        "per-doc rank sum lost its partial aggregation")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("no BroadcastNestedLoopJoin outside the documented allowlist") {
    val offenders = for {
      (name, df) <- plans if !bnljAllowed(name)
      j <- df.queryExecution.executedPlan.collect {
        case j: BroadcastNestedLoopJoinExec => j
      }
    } yield s"$name: ${j.simpleStringWithNodeId()}"
    assert(offenders.isEmpty,
      "nested-loop joins (cross-product risk at scale) outside the " +
        s"allowlist:\n${offenders.mkString("\n")}")
  }
}
