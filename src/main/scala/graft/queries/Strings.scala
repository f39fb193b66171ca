package graft.queries

/** String-function surface (SURVEY.md §2.8.3-§2.8.4). Filled in batch 2. */
object Strings {
  val defs: Map[String, Q] = Map()
}
