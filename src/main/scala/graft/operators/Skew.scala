package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual fallback when AQE's skew-join
  * splitting isn't available (AQE remains the first line of defense; these
  * helpers are for planned-ahead skew like a null-heavy join key or a
  * power-law grouping key).
  *
  * Both patterns trade a bounded replication factor for even partition
  * sizes: no partition ever holds more than ~1/saltFactor of a hot key's
  * rows, so a 1000-executor cluster stays busy instead of waiting on one
  * straggler task.
  */
object Skew {

  /** Deterministic per-row salt in [0, n): hash of the whole row — stable
    * across retries (no rand(), which breaks task re-execution). */
  private def rowSalt(df: DataFrame, n: Int): Column =
    pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(n.toLong))
      .cast("int")

  /** Skew-safe equi-join of a skewed fact against a dimension: the fact
    * side gets a deterministic salt, the dimension side is exploded
    * `saltFactor`× so every (key, salt) pair finds its match. Result equals
    * `fact.join(dim, keys)` exactly; shuffle partitions per hot key shrink
    * by `saltFactor`. Dimension grows ×saltFactor — keep it the small side. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    val salted = fact.withColumn("__salt", rowSalt(fact, saltFactor))
    val expanded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(expanded, keys :+ "__salt").drop("__salt")
  }

  /** Two-stage skew-safe aggregation for NON-algebraic aggregates (e.g.
    * collect_list/distinct-heavy) where Spark's partial aggregation can't
    * pre-reduce: stage 1 groups by (keys, salt) — bounded partition size —
    * stage 2 merges the per-salt partials. Algebraic aggs (sum/count/min/
    * max/avg) don't need this: map-side partial aggregation already bounds
    * them; that shape is asserted in PlanGuardSpec. */
  def saltedDistinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(valueCol)), lit(saltFactor.toLong)).cast("int"))
    // distinct values split by value-hash: each (key, salt) cell holds a
    // DISJOINT slice of the value space, so stage-2 SUM of per-cell
    // distinct counts is exact.
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"${valueCol}_distinct"))
  }
}
