package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Quality}

/** Edge semantics of the quality-filter operators (repetition signals, PII
  * redaction, n-gram decontamination) on constructed documents where the
  * expected fractions are computable by hand.
  */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("repetition signals: hand-computed fractions on a spam-shaped doc") {
    // doc 1: "buy now buy now buy now" — 5 bigrams: (buy now)×3,
    // (now buy)×2 → top2 = 3/5, dup2 = 5/5; 4 trigrams: (buy now buy)×2,
    // (now buy now)×2 → top3 = 2/4, dup3 = 4/4.
    // doc 2: all distinct tokens → top2 = 1/4, dup2 = 0.
    val df = Seq(
        (1L, "buy now buy now buy now"),
        (2L, "a b c d e"),
        (3L, "x y")) // < 3 tokens: excluded
      .toDF("doc_id", "text")
    val got = Quality.repetitionSignals(df, "text", "doc_id", Seq(2, 3))
      .orderBy("doc_id").collect()
    assert(got.length === 2)
    val r1 = got(0)
    assert(r1.getLong(0) === 1L)
    assert(r1.getAs[Double]("top2_frac") === 3.0 / 5)
    assert(r1.getAs[Double]("dup2_frac") === 1.0)
    assert(r1.getAs[Double]("top3_frac") === 2.0 / 4)
    assert(r1.getAs[Double]("dup3_frac") === 1.0)
    val r2 = got(1)
    assert(r2.getAs[Double]("top2_frac") === 1.0 / 4)
    assert(r2.getAs[Double]("dup2_frac") === 0.0)
  }

  test("structuralSignals: hand-computed Gopher shape metrics on crafted " +
      "documents") {
    val docs = Seq(
      // 4 lines: 2 bullets, 1 ellipsis-ended; words "x#y" has '#';
      // "123" has no alpha; duplicate line "- aa bb" appears twice
      (1L, "- aa bb\n- aa bb\nx#y 123 dd ...\ncc dd"),
      // pathological: one word of length 20, no alpha issue
      (2L, "aaaaaaaaaaaaaaaaaaaa"),
      (3L, "")).toDF("doc_id", "text")
    val out = Quality.structuralSignals(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap

    val d1 = out(1L)
    assert(d1.getAs[Int]("n_lines") === 4)
    // words: (- aa bb) ×2 = 6, (x#y 123 dd ...) = 4, (cc dd) = 2 → 12
    assert(d1.getAs[Int]("n_words") === 12)
    assert(d1.getAs[Double]("bullet_line_frac") === 0.5)
    assert(d1.getAs[Double]("ellipsis_line_frac") === 0.25)
    // symbols: one '#', one '...' → 2/12
    assert(d1.getAs[Double]("symbol_word_ratio") === 2.0 / 12)
    // non-alpha words: "-", "-", "123", "..." → alpha = 8/12
    assert(d1.getAs[Double]("alpha_word_frac") === 8.0 / 12)
    // line "- aa bb" (7 chars) duplicated: 2 of 4 line occurrences,
    // 14 of 7+7+14+5 = 33 chars
    assert(d1.getAs[Double]("dup_line_frac") === 0.5)
    assert(d1.getAs[Double]("dup_line_char_frac") === 14.0 / 33)
    assert(!d1.getAs[Boolean]("keep")) // dup_line_frac 0.5 > 0.3

    val d2 = out(2L)
    assert(d2.getAs[Double]("mean_word_len") === 20.0)
    assert(d2.getAs[Double]("dup_line_frac") === 0.0)
    assert(!d2.getAs[Boolean]("keep")) // mean word len 20 > 10

    // empty doc: null fractions, keep = false, no crash
    val d3 = out(3L)
    assert(d3.isNullAt(d3.fieldIndex("mean_word_len")))
    assert(!d3.getAs[Boolean]("keep"))
  }

  test("structuralSignals keeps a normal prose-shaped document") {
    val docs = Seq((1L,
      "the quick brown fox jumps over the lazy dog\n" +
      "pack my box with five dozen liquor jugs\n" +
      "how vexingly quick daft zebras jump")).toDF("doc_id", "text")
    val r = Quality.structuralSignals(docs, "text", "doc_id").head()
    assert(r.getAs[Boolean]("keep"),
      s"prose doc should pass all Gopher structural bounds: $r")
  }

  test("oovRate: vocab boundary is (count desc, token asc) and rates are " +
      "exact") {
    // counts: aa=4, bb=3, cc=3, dd=1 — with V=2 the boundary tie (bb vs
    // cc at count 3) resolves to bb by token ASC... both have count 3, so
    // vocab = {aa, bb}; cc and dd are OOV
    val docs = Seq(
      (1L, "aa bb cc aa"), // 1 OOV of 4
      (2L, "aa bb cc bb aa cc dd aa")) // 3 OOV of 8
      .toDF("doc_id", "text")
    val out = Quality.oovRate(docs, "text", "doc_id", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(1L -> ((4L, 1L, 0.25)), 2L -> ((8L, 3L, 0.375))))
  }

  test("PII redaction replaces all three classes and counts match") {
    val df = Seq(
        (1L, "mail a.b-c_d@ex-ample.org and 10.0.0.1 then 555-0199 end"),
        (2L, "no pii here"),
        (3L, "two mails x@y.io z@w.co and ip 192.168.255.3"))
      .toDF("id", "t")
    val (ne, ni, np) = Quality.piiCounts(col("t"))
    val got = df.select(col("id"), ne.as("e"), ni.as("i"), np.as("p"),
        Quality.redactPii(col("t")).as("red"))
      .orderBy("id").collect()
    assert(got(0).getInt(1) === 1 && got(0).getInt(2) === 1 &&
      got(0).getInt(3) === 1)
    assert(got(0).getString(4) ===
      "mail <EMAIL> and <IP> then <PHONE> end")
    assert(got(1).getInt(1) === 0 && got(1).getInt(2) === 0 &&
      got(1).getInt(3) === 0)
    assert(got(2).getInt(1) === 2 && got(2).getInt(2) === 1)
    assert(got(2).getString(4) === "two mails <EMAIL> <EMAIL> and ip <IP>")
  }

  test("PII redaction order: email local parts are not re-matched as phones") {
    // The local part contains a phone-shaped digit run; replacing emails
    // first keeps the bare phone as the only phone match.
    val df = Seq((1L, "reach 555-0123@x.io or 555-0123")).toDF("id", "t")
    val red = df.select(Quality.redactPii(col("t"))).head.getString(0)
    assert(red === "reach <EMAIL> or <PHONE>")
  }

  test("ngram contamination: only overlapping train docs, distinct-gram counts") {
    // eval doc 100 has grams {a b c, b c d}; train doc 1 shares "a b c"
    // (once, though it appears twice → distinct count 1), train doc 2
    // shares both, train doc 3 shares none.
    val df = Seq(
        (100L, "a b c d"),
        (1L, "a b c x a b c"),
        (2L, "z a b c d q"),
        (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val got = Dedup.ngramContamination(df, "text", "doc_id",
        col("doc_id") >= 100L, k = 3)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L))
  }

  test("cleanCorpus: each drop reason fires independently, keeper survives") {
    // one doc per drop reason, so a regression in any stage flips exactly
    // one row's verdict:
    //   1   clean English doc            -> keep
    //   2   exact duplicate of 1         -> dropped (not keeper)
    //   3   3 tokens                     -> dropped (quality: too short)
    //   4   shares "the lazy dog today"  -> dropped (contaminated, 2 grams)
    //   5   German, but has "in"         -> dropped (lang only; quality ok)
    //   100 the eval doc itself          -> dropped (is_eval)
    val good = "the cat and the dog is in a house of wonders"
    val df = Seq(
        (1L, good),
        (2L, good),
        (3L, "tiny text here"),
        (4L, "we saw the lazy dog today in a field of dreams and it is great"),
        (5L, "der hund und die katze ist ein tier in der haus und das feld"),
        (100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val got = Quality.cleanCorpus(df, "text", "doc_id",
        isEval = col("doc_id") === 100L, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getString(3), r.getBoolean(4),
          r.getLong(5), r.getBoolean(6))).toMap
    //                 (is_eval, is_keeper, lang, quality, n_overlap, keep)
    assert(got(1L) === ((false, true, "en", true, 0L, true)))
    assert(got(2L) === ((false, false, "en", true, 0L, false)))
    assert(got(3L)._4 === false && got(3L)._6 === false)
    assert(got(4L) === ((false, true, "en", true, 2L, false)))
    assert(got(5L)._3 === "de" && got(5L)._4 === true && got(5L)._6 === false)
    assert(got(100L)._1 === true && got(100L)._6 === false)
  }

  test("cleanCorpus thresholds are wired: maxOverlap and keepLang flip verdicts") {
    val df = Seq(
        (4L, "we saw the lazy dog today in a field of dreams and it is great"),
        (5L, "der hund und die katze ist ein tier in der haus und das feld"),
        (100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    def keeps(k: Long, lang: String) =
      Quality.cleanCorpus(df, "text", "doc_id",
          isEval = col("doc_id") === 100L, k = 3,
          maxOverlap = k, keepLang = lang)
        .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    // doc 4 shares 2 eval grams: dropped at the default 0, kept at 2
    assert(keeps(0L, "en")(4L) === false)
    assert(keeps(2L, "en")(4L) === true)
    // doc 5 is German: dropped under keepLang=en, kept under keepLang=de
    assert(keeps(0L, "en")(5L) === false)
    assert(keeps(0L, "de")(5L) === true)
  }

  test("ngram contamination shuffle-join path matches broadcast path") {
    val df = (0L until 60L).map(i =>
        (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} tok${i % 5}"))
      .toDF("doc_id", "text")
    val isEval = col("doc_id") % 10 === 0
    val a = Dedup.ngramContamination(df, "text", "doc_id", isEval, 3,
      broadcastEval = true).orderBy("id").collect().toSeq
    val b = Dedup.ngramContamination(df, "text", "doc_id", isEval, 3,
      broadcastEval = false).orderBy("id").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("bloom decontamination pre-prune: no false negatives vs the exact " +
      "join, FP-bounded with honest sizing") {
    val df = (0L until 200L).map { i =>
      // eval docs (i%20==0) share trigrams with i%20==1 neighbors only
      val base = if (i % 20 <= 1) s"sh${i / 20}a sh${i / 20}b sh${i / 20}c"
        else s"u${i}a u${i}b u${i}c u${i}d"
      (i, base)
    }.toDF("doc_id", "text")
    val isEval = col("doc_id") % 20 === 0
    val exact = Dedup.ngramContamination(df, "text", "doc_id", isEval, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Dedup.ngramContaminationBloom(df, "text", "doc_id", isEval,
        3, expectedGrams = 10000L, numBits = 100000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // superset: every exactly-contaminated doc is flagged at >= its exact
    // overlap (Bloom filters have no false negatives)
    for ((id, n) <- exact)
      assert(bloom.getOrElse(id, 0L) >= n, s"false negative on doc $id")
    // bounded overshoot: at 10 bits/item the FP rate is ~1%; allow the
    // flagged DOC set to exceed the exact one by at most a few docs
    assert(bloom.size - exact.size <= 5,
      s"FP overshoot: ${bloom.size} flagged vs ${exact.size} exact")
  }

  test("graft_bloom_agg / graft_might_contain round-trip through SQL text") {
    graft.functions.SqlFunctions.register(spark)
    Seq(1L, 2L, 3L).toDF("x").createOrReplaceTempView("bloom_t")
    val flags = spark.sql(
      """WITH bf AS (SELECT graft_bloom_agg(xxhash64(x), 100L, 8192L) AS b
        |            FROM bloom_t)
        |SELECT x, graft_might_contain((SELECT b FROM bf), xxhash64(x)),
        |       graft_might_contain((SELECT b FROM bf), xxhash64(x + 100))
        |FROM bloom_t ORDER BY x""".stripMargin).collect()
    assert(flags.forall(_.getBoolean(1)))   // members always hit
    assert(flags.exists(!_.getBoolean(2)))  // non-members mostly miss
  }
}
