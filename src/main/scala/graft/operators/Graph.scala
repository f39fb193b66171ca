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
    val e = edges.select(col(src).as("a"), col(dst).as("b"))
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.b") === col("bc.a"))
      .join(e.as("ac"),
        col("ac.a") === col("ab.a") && col("ac.b") === col("bc.b"))
      .select(col("ab.a").as("x"), col("ab.b").as("y"), col("bc.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_tri"))
  }
}
