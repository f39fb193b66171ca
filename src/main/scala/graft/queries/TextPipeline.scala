package graft.queries

/** LLM-training-data pipeline ops: dedup, text analysis, fingerprinting. */
object TextPipeline {
  val defs: Map[String, Q] = Map()
}
