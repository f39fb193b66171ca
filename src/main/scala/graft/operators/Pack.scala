package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-order preparation: deterministic global shuffle into shards,
  * and GPT-style sequence packing (concatenate-then-split) within each
  * shard — the last two steps that turn a cleaned, chunked corpus into the
  * exact byte layout a pretraining job consumes.
  *
  * Both are pure functions of (id, seed, nShards, seqLen): stable across
  * runs, engines, and partitionings, so a re-run of the pipeline yields
  * byte-identical shards — the property that makes training reproducible
  * and resumable (reference analog: fletcher's deterministic take/sort
  * surfaces, core/strings.py ordering contracts; the packing step itself
  * is beyond-parity, standard LLM-pretraining practice).
  *
  * Scale shape: ONE hash-partition shuffle on the shard key; the
  * within-shard order/cumsum is a per-shard window whose state is a
  * counter (row_number) / running sum — no buffering, no global sort.
  * With nShards ≥ cluster parallelism every executor owns whole shards
  * and the sort is per-shard local. Nothing here touches text: callers
  * join the (id → shard, seq, pack) assignment back to the payload, so
  * the only bytes through the shuffle are ids and token counts.
  */
object Pack {

  private val M = 2147483647L // 2^31 − 1 (Mersenne), the Knuth-hash modulus

  /** The shuffle key: pmod(pmod(id, M)·2654435761 + seed, M) — the same
    * Knuth multiplicative hash family as [[TextOps.capPerKey]], salted by
    * `seed` so successive epochs get independent orders. pmod-before-
    * multiply bounds the product below 2^63 (no ANSI overflow, no
    * engine-dependent wrap); pmod-after keeps the key non-negative for
    * negative ids. */
  def shuffleKey(id: Column, seed: Long): Column =
    pmod(pmod(id, lit(M)) * lit(2654435761L) + lit(seed % M), lit(M))

  /** Deterministic shuffle + sharding: assign every row a shard in
    * [0, nShards) and a dense within-shard sequence number, ordered by the
    * salted hash (ties by id — hash collisions must not make the layout
    * partition-dependent). Output: input columns + (shard, seq).
    *
    * This IS the training-data "global shuffle": hash order is a uniform
    * pseudo-random permutation, but unlike a random shuffle it is a pure
    * function of (id, seed) — rerunning at any cluster size yields the
    * same shard files in the same order. */
  def shardDocs(df: DataFrame, idCol: String, nShards: Int,
      seed: Long): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val h = shuffleKey(col(idCol), seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("seq", row_number().over(w) - 1)
      .drop("__h")
  }

  /** GPT-style sequence packing, concatenate-then-split: lay the shard's
    * documents end to end in shuffle order and cut every `seqLen` tokens.
    * A document whose token interval crosses a cut contributes one PIECE
    * per training sequence it overlaps — exactly how pretraining batches
    * are formed (no padding, no dropped tail except the shard's final
    * partial sequence, which is emitted short).
    *
    * Input: one row per document with a token count in `nTokCol` (e.g.
    * from [[graft.queries.TextPipeline]] token counting). Output: one row
    * per (document × overlapped pack):
    *   (input cols…, shard, seq, pack, doc_from, doc_to, pack_from)
    * where [doc_from, doc_to) is the token slice of THIS document that
    * lands in pack `pack`, at offset pack_from inside the pack. Every
    * token of every document appears in exactly one piece, and every pack
    * except each shard's last holds exactly seqLen tokens — invariants
    * the spec pins.
    *
    * All arithmetic is integer (window cumsum of BIGINT counts, floor
    * divisions), so the layout is bitwise-identical in any engine — the
    * oracle re-derives it from the data alone. */
  def packTokens(df: DataFrame, idCol: String, nTokCol: String,
      nShards: Int, seed: Long, seqLen: Int): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val sharded = shardDocs(df, idCol, nShards, seed)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // start = tokens before this doc in its shard; the doc occupies
    // [start, start + n) of the shard's concatenated token stream.
    val withStart = sharded
      .withColumn("__cum", sum(col(nTokCol)).over(w))
      .withColumn("__start", col("__cum") - col(nTokCol))
      .filter(col(nTokCol) > 0) // an empty doc owns no tokens, no piece
    // packs overlapped: start div L .. (start+n−1) div L — `div` is exact
    // BIGINT division (a double-rounding `/`+floor would break past 2^53)
    withStart
      .withColumn("pack",
        explode(sequence(
          expr(s"__start div $seqLen"),
          expr(s"(__start + `$nTokCol` - 1) div $seqLen"))))
      .withColumn("doc_from",
        greatest(col("pack") * seqLen - col("__start"), lit(0L)))
      .withColumn("doc_to",
        least((col("pack") + 1) * seqLen - col("__start"), col(nTokCol)))
      .withColumn("pack_from",
        greatest(col("__start") - col("pack") * seqLen, lit(0L)))
      .drop("__cum", "__start")
  }

  /** Materialize the packed PIECES as text: [[packTokens]] over the token
    * counts, then each piece's token slice [doc_from, doc_to) cut from the
    * document — the writer step that turns the layout into the bytes a
    * trainer reads (concatenating a pack's pieces in pack_from order yields
    * its training sequence verbatim).
    *
    * Scale shape: the layout side carries only ids and counts through the
    * shard exchange; text joins back ONCE, by id, after the explode — and
    * since a document averages ≤ 2 pieces (1 + n/L crossings), text bytes
    * move ≈ once, not once per pack. The slice itself is a narrow
    * codegen'd array op. */
  def packText(docs: DataFrame, textCol: String, idCol: String,
      nShards: Int, seed: Long, seqLen: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val counts = docs.select(col(idCol),
      size(toks).cast("long").as("__n_tok"))
    val layout = packTokens(counts, idCol, "__n_tok", nShards, seed, seqLen)
    layout
      .join(docs.select(col(idCol), toks.as("__w")), Seq(idCol))
      .select(col(idCol), col("shard"), col("pack"), col("pack_from"),
        array_join(
          slice(col("__w"), (col("doc_from") + 1).cast("int"),
            (col("doc_to") - col("doc_from")).cast("int")), " ")
          .as("piece_text"))
  }
}
