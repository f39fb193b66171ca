package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed merge utilities — the batch CDC layer (upsert, snapshot diff)
  * every incrementally-maintained corpus needs once it lives as parquet
  * snapshots rather than a mutable store. Spark-first spellings: an upsert
  * is updates ∪ (base ⟕anti updates); a diff is one full-outer join
  * classified row-by-row. Both shuffle by the merge key only — payload
  * columns ride along, nothing collects, no iteration.
  *
  * Reference analog: fletcher frames are immutable pandas snapshots;
  * merging day N into day N−1 is exactly this composition at cluster
  * scale.
  */
object Merge {

  /** Last-writer-wins upsert: every key in `updates` replaces its row in
    * `base`; keys only in `base` survive unchanged. Schemas must match.
    * Plan: one left-anti hash join on the key + a zero-shuffle union —
    * at scale both sides hash by `key` once (AQE broadcasts a small
    * update batch, the common CDC case). */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    updates.unionByName(
      base.join(updates.select(col(key)), Seq(key), "left_anti"))

  /** SCD2 (slowly-changing-dimension type 2) build: turn a CHANGE LOG —
    * one row per version of a key, stamped with an integral change time —
    * into validity intervals [valid_from, valid_to] (inclusive both ends,
    * the BETWEEN convention [[graft.operators.RangeJoin]] consumes): each
    * version is valid from its own change time until one tick before the
    * key's next change, the last version until `horizon`. Point-in-time
    * enrichment of a fact stream is then exactly
    * `RangeJoin.pointInInterval(facts, scd2(dim), key, ts, …)` — the
    * classic warehouse dimension pattern, with the bin-blocked join
    * keeping it linear at scale.
    *
    * One lead() window PARTITIONED BY KEY — parallel, state is one row.
    * `tieBreak` must make (key, tsCol, tieBreak…) a total order; two
    * versions at the SAME change time yield an empty interval
    * [t, t−1] for the earlier one (deterministically the lesser tieBreak),
    * which BETWEEN — and RangeJoin's `end >= start` pre-filter — drop:
    * last-writer-wins within a timestamp tick. */
  def scd2(changes: DataFrame, key: String, tsCol: String,
      tieBreak: Seq[String], horizon: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy((tsCol +: tieBreak).map(col(_).asc): _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to",
        coalesce(lead(col(tsCol), 1).over(w) - 1, lit(horizon)))
  }

  /** Event-time last-writer-wins merge: between `base` and `updates`, keep
    * per key the single row GREATEST by the `ord` columns (descending, with
    * `ord` ∪ {key} a row key so the winner is unique). Unlike [[upsert]],
    * which trusts arrival order, this is the out-of-order-safe CDC merge —
    * a late-arriving old row can never overwrite a newer one (the Delta
    * `MERGE … WHEN MATCHED AND s.ts < u.ts` pattern). Plan: one union +
    * one key-partitioned row_number window — state and batch hash by the
    * key once; window state is a single row counter. */
  def upsertLatest(base: DataFrame, updates: DataFrame, key: String,
      ord: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(ord.map(col(_).desc): _*)
    base.unionByName(updates)
      .withColumn("__mg_rn", row_number().over(w))
      .filter(col("__mg_rn") === 1)
      .drop("__mg_rn")
  }

  /** Snapshot diff: classify every key as 'added' (only in `next`),
    * 'removed' (only in `prev`), or 'changed' (in both, any compared
    * column differs — null-safe). Unchanged keys are dropped. Output:
    * key, change, and the prev_/next_ value of each compared column.
    * ONE full-outer hash join on the key; side presence rides as a
    * literal-true flag on each input (a missing side leaves it null), so
    * payload nulls can't masquerade as absence; the change column is a
    * narrow null-safe comparison — no second pass. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    // fail-fast like the other merge operators (ExceptionParitySpec
    // convention) instead of a bare UnsupportedOperationException from the
    // reduce below
    require(compareCols.nonEmpty,
      "snapshotDiff needs at least one compared column")
    val p = prev.select(col(key) +: compareCols.map(c =>
      col(c).as(s"prev_$c")) :+ lit(true).as("__in_prev"): _*)
    val n = next.select(col(key) +: compareCols.map(c =>
      col(c).as(s"next_$c")) :+ lit(true).as("__in_next"): _*)
    val changed = compareCols
      .map(c => !(col(s"prev_$c") <=> col(s"next_$c")))
      .reduce(_ || _)
    p.join(n, Seq(key), "full_outer")
      .withColumn("change",
        when(col("__in_prev").isNull, lit("added"))
          .when(col("__in_next").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change").isNotNull)
      .drop("__in_prev", "__in_next")
  }
}
