package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps._

/** Deduplication operators for 100 TB-scale corpus cleaning.
  *
  * Scale design: exact dedup shuffles only a 128-bit digest, never the text;
  * MinHash LSH turns the quadratic all-pairs problem into a bucket-local
  * self-join (candidates only collide within a band bucket) and re-joins the
  * signature sets by doc_id for the exact-Jaccard verify, so no wide arrays
  * travel through the exploded band shuffle. All expressions are codegen'd —
  * no UDFs anywhere.
  */
object Dedup {

  /** Exact duplicate groups keyed by md5(text): (text_hash, keeper = min id,
    * n_copies). Only the digest is shuffled. */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash signature over distinct k-shingle hashes.
    * Returns (id, h: array<long> shingle hashes, m: array<long> 16 minhashes). */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
        col(idCol).as("id"),
        when(size(toks) >= k, shingleHashes(col(textCol), k))
          .otherwise(array().cast("array<bigint>")).as("h"))
      .filter(size(col("h")) > 0)
      .withColumn("m", minHashSig(col("h")))
  }

  /** LSH candidate pairs with exact-Jaccard verification.
    * Output: (id1, id2, jacc, is_dup) — id1 < id2, band-deduplicated.
    */
  def minhashDupPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int, threshold: Double): DataFrame = {
    // The signature subtree feeds BOTH the band-bucket branch and the
    // exact-verify self-join; without materialization Spark recomputes the
    // (expensive) shingle hashing for each branch. Signatures are small —
    // (id, hash-set, 16 minhashes), no text — so MEMORY_AND_DISK is safe
    // at corpus scale; callers may unpersist after consuming the result.
    val sig = minhashSignatures(docs, textCol, idCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // band buckets: only (band, key) and id travel through this shuffle
    val buckets = sig.select(col("id"),
      posexplode(bandKeys(col("m"))).as(Seq("band", "key")))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()
    // join the shingle sets back by id for the exact verify
    val h = sig.select(col("id"), col("h"))
    cand
      .join(h.withColumnRenamed("id", "id1").withColumnRenamed("h", "h1"), "id1")
      .join(h.withColumnRenamed("id", "id2").withColumnRenamed("h", "h2"), "id2")
      .select(col("id1"), col("id2"),
        jaccard(col("h1"), col("h2")).as("jacc"))
      .withColumn("is_dup", col("jacc") >= threshold)
  }

  /** 30-bit SimHash fingerprint per document (over distinct token hashes),
    * plus the two 15-bit halves used for banded near-dup lookup. */
  def simhashFingerprints(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val h = array_distinct(transform(tokens(col(textCol)), t =>
      graft.expressions.TextExpressions.polyHash(t)))
    docs.select(col(idCol).as("id"), h.as("h"))
      .withColumn("simhash", simHash30(col("h")))
      .withColumn("band_lo", col("simhash") % lit(1 << 15))
      .withColumn("band_hi", (col("simhash") / lit(1 << 15)).cast("bigint"))
      .drop("h")
  }

  /** Connected components over an undirected dup-pair graph (id1, id2):
    * returns (id, keeper) where keeper = min id of the component — the
    * "which copy do we keep" step that turns near-dup PAIRS into dedup
    * DECISIONS. Iterative min-label propagation (the Pregel pattern):
    * each round is a shuffle-by-neighbor join + min-aggregate, fully
    * parallel; rounds = component diameter (near-dup clusters are
    * shallow — a handful of rounds in practice, `maxIter` caps
    * pathological chains). */
  def dupGroups(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // pairs feeds both union branches — cache it so the (expensive)
    // upstream pair pipeline runs once, not twice
    val p = pairs.persist(lvl)
    p.count()  // eager: the union below scans p twice concurrently —
               // materializing first makes both scans cache hits
    val edges = p.select(col("id1").as("a"), col("id2").as("b"))
      .union(p.select(col("id2").as("a"), col("id1").as("b")))
      .persist(lvl)
    // localCheckpoint per round: labels feeds THREE places each round
    // (neighbor join, relax join, pointer-jump), so a lazy plan would
    // double per iteration — exponential logical-plan growth is the classic
    // iterative-Spark failure (manifests as analyzer/explain OOM long
    // before data size matters). Checkpointing truncates plan + lineage.
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // relax: take the min label among neighbors
      val neighborMin = edges.join(labels, edges("a") === labels("id"))
        .groupBy(col("b").as("nid")).agg(min(col("label")).as("nlabel"))
      val relaxed = labels.join(neighborMin, labels("id") === col("nid"),
          "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("mid"))
      // pointer-jump: follow the label's own label (path compression) —
      // relax alone needs O(diameter) rounds; relax+jump needs O(log d)
      val jumpTo = relaxed.select(col("id").as("jid"), col("mid").as("jlabel"))
      val jumped = relaxed.join(jumpTo, col("mid") === col("jid"))
        .select(col("id"), col("old"),
          least(col("mid"), col("jlabel")).as("label"))
        .localCheckpoint(true)
      changed = jumped.filter(col("label") < col("old")).count()
      labels = jumped.select(col("id"), col("label"))
      iter += 1
    }
    edges.unpersist()
    p.unpersist()
    labels.withColumnRenamed("label", "keeper")
  }

  /** Exact word-set Jaccard pairs within a blocking key (e.g. lang).
    * Quadratic within each block — the exact-verify kernel; production-scale
    * candidate generation is [[minhashDupPairs]]. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    // persisted: both sides of the self-join would otherwise re-hash the
    // corpus (same pattern as minhashDupPairs)
    val withSets = docs.select(col(idCol).as("id"), col(blockCol).as("block"),
      array_distinct(transform(tokens(col(textCol)), t =>
        graft.expressions.TextExpressions.polyHash(t))).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withSets.as("a").join(withSets.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.block").as("block"),
        jaccard(col("a.h"), col("b.h")).as("jacc"))
      .filter(col("jacc") >= threshold)
  }
}
