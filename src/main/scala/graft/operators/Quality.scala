package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps._

/** Corpus quality-filtering operators beyond the per-row heuristics in
  * [[TextOps]]: n-gram repetition signals (the Gopher/C4 family of filters)
  * and PII redaction.
  *
  * Scale design: repetition signals shuffle only (doc_id, gram-hash)
  * pairs — never the document text — and aggregate map-side first; PII
  * redaction is a pure narrow regexp projection (codegen'd, no UDFs).
  */
object Quality {

  /** Per-document word n-gram repetition signals for each k in `ks`:
    *
    *   - `top{k}_frac` — occurrences of the single most frequent k-gram
    *     divided by the total k-gram count (Gopher's "fraction of text in
    *     the most common n-gram", word-level);
    *   - `dup{k}_frac` — fraction of k-gram occurrences whose gram appears
    *     more than once (Gopher's "duplicate n-gram fraction").
    *
    * Only documents with at least `max(ks)` tokens are scored — shorter
    * documents have no k-gram for the largest k and belong to a length
    * filter, not a repetition filter.
    *
    * Scale: explode → groupBy(doc, gram-HASH) — the shuffle carries two
    * longs per occurrence, not text; partial aggregation collapses repeats
    * map-side, so a pathological million-token spam doc contributes its
    * distinct-gram count to the shuffle, not its length. Signals for all
    * ks are computed from independent shuffles and joined back on doc_id
    * (each side already reduced to one row per doc).
    */
  def repetitionSignals(docs: DataFrame, textCol: String, idCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be positive")
    val scored = docs
      .filter(size(tokens(col(textCol))) >= ks.max)
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    ks.map { k =>
      // gram identity = combined token-hash (TextOps.shingleHashesAll):
      // collision-safe enough for a quality *signal* and 8 bytes instead
      // of k words — and no gram string is ever built.
      val grams = scored.select(col("doc_id"),
        explode(shingleHashesAll(col("__text"), k)).as("g"))
      grams.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id")).agg(
          (max(col("n")) / sum(col("n"))).as(s"top${k}_frac"),
          (sum(when(col("n") > 1, col("n")).otherwise(0L)) / sum(col("n")))
            .as(s"dup${k}_frac"))
    }.reduce(_.join(_, Seq("doc_id")))
  }

  // ---- PII patterns (shared with the DuckDB oracle via DuckFrag; kept to
  // the RE2-safe common subset of Java and RE2 regex: no backrefs, no
  // lookaround) ----
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Match counts per PII class, before redaction. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailRe)),
      regexp_count(text, lit(Ipv4Re)),
      regexp_count(text, lit(PhoneRe)))

  /** Redact PII in place: emails → `<EMAIL>`, IPv4s → `<IP>`, then
    * phone-shaped digit groups → `<PHONE>`. Order matters — emails and IPs
    * are replaced first so their digit runs can't be re-matched as phones.
    * A pure narrow projection: no shuffle, codegen'd regexp. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** The composed corpus-cleaning pass a training-data pipeline actually
    * runs: one auditable DECISION RECORD per document —
    *
    *   - `is_keeper`   exact-dedup survivor (doc_id == min id of its
    *                   md5(text) group);
    *   - `lang_pred`   n-gram-heuristic language id ([[TextOps.langPredict]]);
    *   - `keep_quality` token-count bounds + stopword-ratio floor (the
    *                   q_pipe_text_quality filter);
    *   - `n_overlap`   distinct k-gram collisions with the eval set
    *                   ([[Dedup.ngramContamination]], 0 when clean);
    *   - `keep`        the conjunction: non-eval ∧ keeper ∧ quality ∧
    *                   lang == keepLang ∧ n_overlap ≤ maxOverlap.
    *
    * Emitting the full record (not just survivors) is deliberate: at 100 TB
    * you audit WHY documents dropped (and rates per reason) before
    * committing to a filter config; the survivor set is `.filter(col("keep"))`.
    *
    * Scale: quality + lang are narrow projections; the dedup-keeper join
    * shuffles only (md5 digest, id); contamination broadcasts the DISTINCT
    * eval gram set so the train side never shuffles; the final assembly is
    * one digest-keyed join plus one left join on id. Text never travels
    * through any shuffle.
    */
  def cleanCorpus(docs: DataFrame, textCol: String, idCol: String,
      isEval: Column, k: Int = 3, minTokens: Int = 10, maxTokens: Int = 1000,
      minStopRatio: Double = 0.01, keepLang: String = "en",
      maxOverlap: Long = 0L): DataFrame = {
    val toks = tokens(col("__text"))
    val nTok = size(toks)
    val stopR = stopHits(toks, StopEn).cast("double") / nTok.cast("double")
    val base = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        isEval.as("is_eval"))
      .withColumn("__h", md5(col("__text")))
    val keepers = base.groupBy(col("__h")).agg(min(col("doc_id")).as("__keeper"))
    val contam = Dedup.ngramContamination(docs, textCol, idCol, isEval, k)
      .select(col("id").as("doc_id"), col("n_overlap"))
    base
      .withColumn("lang_pred", langPredict(toks))
      .withColumn("keep_quality",
        nTok >= minTokens && nTok <= maxTokens && stopR >= minStopRatio)
      .join(keepers, "__h")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_eval"),
        (col("doc_id") === col("__keeper")).as("is_keeper"),
        col("lang_pred"), col("keep_quality"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("keep",
        !col("is_eval") && col("is_keeper") && col("keep_quality") &&
          col("lang_pred") === lit(keepLang) &&
          col("n_overlap") <= lit(maxOverlap))
  }
}
