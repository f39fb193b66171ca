package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-quantization (int8) ANN — the OTHER compression path of
  * similarity search, complementing [[Pq]]'s product quantization: each
  * dimension of the L2-NORMALIZED vector is mapped independently to a
  * 0..255 code against per-dimension [min, max] ranges learned from the
  * corpus. A 64-dim double vector (512 B) becomes 64 bytes with no
  * codebook training loop — SQ is the standard first rung of the
  * memory/recall ladder (cheap, near-exact at 8 bits) before PQ/IVF.
  *
  * Normalizing before quantization makes integer squared-L2 over codes a
  * monotone proxy for cosine (on unit vectors ‖a−b‖² = 2 − 2·cos), so
  * recall@k against the cosine brute-force baseline measures QUANTIZATION
  * loss only, not a metric mismatch.
  *
  * Determinism/oracle story: ranges are per-dim min/max (exact — no
  * averaging); code assignment is floor of single-rounded IEEE arithmetic
  * (sub, mul, div — bitwise identical in any IEEE engine, no
  * transcendentals); distances are BIGINT sums of products of code
  * deltas (exact, association-independent). The whole pipeline is
  * therefore hash-reproducible in DuckDB from the data alone — no
  * side-table handoff needed, unlike the k-means-trained IVF/PQ gates.
  *
  * Scale shape: range learning is one posexplode + groupBy(pos) with
  * map-side partial min/max — the shuffle carries dim rows per partition,
  * never vectors; encoding is a narrow per-row fold over a 2·dim-double
  * literal; scoring broadcasts the query codes, so the corpus never
  * shuffles (same shape as [[Similarity.knnBrute]], over 8-bit codes
  * instead of doubles).
  */
object Sq {

  final case class SqRange(mins: Array[Double], maxs: Array[Double])

  /** The normalized coordinate: v[i] / ‖v‖ (exact IEEE division, mirrored
    * by the oracle as `v[i] / nrm`). Zero-norm vectors pass through
    * unnormalized (all zeros — same guard as Ivfpq.unit): ANSI division
    * would otherwise throw on the first all-zero embedding. */
  private def normed(v: Column, nrm: Column): Column =
    when(nrm > 0.0, transform(v, x => x / nrm)).otherwise(v)

  /** Per-dimension [min, max] of the NORMALIZED corpus coordinates.
    * One narrow posexplode + groupBy(pos): partial aggregation collapses
    * each partition to `dim` rows before the shuffle, and the collect is
    * exactly `dim` rows — bounded by the embedding width, not the corpus.
    * min/max are exact (no summation), so the ranges are deterministic
    * for a dataset regardless of partitioning. */
  def trainRange(corpus: DataFrame): SqRange = {
    val rows = corpus
      .select(posexplode(normed(col("v"), col("nrm"))).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
      .sortBy(_.getInt(0))
    SqRange(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** 0..255 codes for the normalized vector: per dim i,
    * clamp(floor((v[i]/nrm − min_i) · 255 / (max_i − min_i)), 0, 255);
    * a degenerate dim (max = min) codes to 0. Every operation is
    * single-rounded IEEE double arithmetic followed by an exact floor —
    * the oracle reproduces the codes bitwise from the same ranges.
    * Constant-dim rule first: the general branch would divide by zero.
    * One narrow fold over a 2·dim literal — no join, no shuffle. */
  def codesFor(v: Column, nrm: Column, r: SqRange): Column = {
    val mins = typedLit(r.mins.toSeq)
    val maxs = typedLit(r.maxs.toSeq)
    transform(normed(v, nrm), (x, i) => {
      val mn = element_at(mins, i + 1)
      val mx = element_at(maxs, i + 1)
      when(mx === mn, lit(0L)).otherwise(
        least(greatest(floor((x - mn) * lit(255.0) / (mx - mn)), lit(0L)),
          lit(255L)))
    })
  }

  /** Integer squared L2 between two code arrays: Σ (a_i − b_i)² as BIGINT —
    * exact in any engine, any order. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L),
      (acc, x) => acc + x)

  /** Top-k neighbors by int8-code squared L2 for the query ids.
    * Ranking ties break by ascending neighbor_id (codes collide far more
    * often than doubles — the tie rule is load-bearing for determinism).
    * Output: (query_id, neighbor_id, sq_dist). */
  def knnSq8(emb: DataFrame, vecCol: String, idCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = Similarity.prepared(emb, vecCol, idCol)
    val r = trainRange(corpus)
    val coded = corpus.select(col("id"),
      codesFor(col("v"), col("nrm"), r).as("codes"))
    val queries = coded.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("codes").as("qc"))
    val scored = coded.join(broadcast(queries),
        col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        sqDist(col("qc"), col("codes")).as("sq_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sq_dist").asc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn")
  }
}
