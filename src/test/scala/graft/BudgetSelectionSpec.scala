package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

/** Semantics of the data-mix selection operators: token-budget prefixes
  * (TextOps.selectToTokenBudget) and quality-preferring dup-group keepers
  * (Dedup.keepBestPerGroup).
  */
class BudgetSelectionSpec extends SparkTestBase {
  import spark.implicits._

  private val mix = Seq(
    // (doc_id, source, n_tok)
    (1L, "web", 100), (2L, "web", 300), (3L, "web", 250), (4L, "web", 500),
    (5L, "code", 900), (6L, "code", 200), (7L, "code", 50))
    .toDF("doc_id", "source", "n_tok")

  private def kept(budget: Long): Set[Long] =
    TextOps.selectToTokenBudget(mix, "source", "doc_id", "n_tok", budget)
      .select($"doc_id").as[Long].collect().toSet

  test("token budget keeps a per-key prefix whose total stays within budget") {
    val df = TextOps.selectToTokenBudget(mix, "source", "doc_id", "n_tok", 600L)
    val rows = df.collect()
    val bySource = rows.groupBy(_.getString(1))
    for ((_, rs) <- bySource) {
      assert(rs.map(_.getInt(2).toLong).sum <= 600L)
      // cum_tokens of the last kept doc equals the key's kept total
      assert(rs.map(_.getLong(3)).max === rs.map(_.getInt(2).toLong).sum)
    }
  }

  test("budget growth only ever ADDS documents (prefix stability)") {
    val budgets = Seq(0L, 100L, 400L, 700L, 1200L, 10000L)
    val keptSets = budgets.map(kept)
    for (Seq(a, b) <- keptSets.sliding(2))
      assert(a.subsetOf(b), s"budget growth removed docs: ${a -- b}")
    assert(keptSets.head === Set.empty)
    assert(keptSets.last === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("selection is greedy-prefix in hash order, not knapsack") {
    // with budget 260 the code source keeps docs in hash order until the
    // first overflow; every doc AFTER the overflow point is excluded even
    // if it alone would fit (prefix semantics = reproducible mixes)
    val order = mix.filter($"source" === "code")
      .withColumn("h", pmod(pmod($"doc_id", lit(2147483647L)) *
        lit(2654435761L), lit(2147483647L)))
      .orderBy($"h", $"doc_id").select($"doc_id").as[Long].collect()
    val keep = kept(260L).intersect(Set(5L, 6L, 7L))
    // walk the hash order accumulating until the budget trips
    var cum = 0L
    val byId = Map(5L -> 900L, 6L -> 200L, 7L -> 50L)
    val expected = order.takeWhile { id => cum += byId(id); cum <= 260L }.toSet
    assert(keep === expected)
  }

  test("keepBestPerGroup re-keys every member to the highest-score doc") {
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L), (11L, 9L))
      .toDF("id", "keeper")
    val score = Seq((1L, 10L), (2L, 99L), (3L, 50L), (9L, 7L), (11L, 7L))
      .toDF("doc_id", "n_chars")
    val out = Dedup.keepBestPerGroup(groups, score, "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // group 1: doc 2 has the top score; group 9: tie on score -> min id 9
    assert(out === Map(
      1L -> ((1L, 2L)), 2L -> ((1L, 2L)), 3L -> ((1L, 2L)),
      9L -> ((9L, 9L)), 11L -> ((9L, 9L))))
  }
}
