package graft.queries

/** Embedding similarity search (brute-force + LSH-bucketed ANN). */
object Similarity {
  val defs: Map[String, Q] = Map()
}
