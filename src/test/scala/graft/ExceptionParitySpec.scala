package graft

import org.apache.spark.sql.functions._
import graft.expressions.TextExpressions._
import graft.operators.{Reshape, Similarity}

/** Exception-parity guards — the Spark analog of the reference pinning that
  * fletcher raises the same exceptions as pandas for bad arguments
  * (reference tests/test_text.py:193-213 `_check_str_to_t`).
  *
  * Invalid scalar arguments must fail FAST at Column-construction time with
  * an IllegalArgumentException carrying a pandas/Python-parity message —
  * never silently mis-evaluate, and never defer the failure to executor
  * runtime where it would surface as a wrapped SparkException after a full
  * scan. The SQL surface wraps the same expressions, so the same construction
  * errors must also abort analysis of a SQL text query.
  */
class ExceptionParitySpec extends SparkTestBase {
  import spark.implicits._

  private def messageChain(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.toString
  }

  test("textSlice(step=0) raises at construction (pandas ValueError parity)") {
    val e = intercept[IllegalArgumentException](textSlice($"s", 0, 5, step = 0))
    assert(e.getMessage.contains("slice step cannot be zero"))
  }

  test("normalizeText with unknown form raises at construction") {
    val e = intercept[IllegalArgumentException](normalizeText($"s", "NFX"))
    assert(e.getMessage.contains("bad form"))
    // all four legal forms construct fine
    for (f <- Seq("NFC", "NFD", "NFKC", "NFKD")) normalizeText($"s", f)
  }

  test("wrapText with non-positive width raises at construction") {
    for (w <- Seq(0, -1)) {
      val e = intercept[IllegalArgumentException](wrapText($"s", w))
      assert(e.getMessage.contains("wrap width must be positive"))
    }
  }

  test("utf8Is with unknown predicate raises at construction") {
    val e = intercept[IllegalArgumentException](utf8Is($"s", "bogus"))
    assert(e.getMessage.contains("unknown predicate"))
  }

  test("textPartition with out-of-range part index raises at construction") {
    for (i <- Seq(-1, 3)) {
      val e = intercept[IllegalArgumentException](textPartition($"s", ",", i))
      assert(e.getMessage.contains("partition part index"))
    }
    for (i <- 0 to 2) textPartition($"s", ",", i)
  }

  test("SQL surface: graft_slice(step=0) aborts query analysis, not execution") {
    graft.functions.SqlFunctions.register(spark)
    spark.range(1).selectExpr("cast(id as string) as s")
      .createOrReplaceTempView("ep_one")
    val e = intercept[Throwable] {
      spark.sql("SELECT graft_slice(s, 0, 5, 0) FROM ep_one").collect()
    }
    assert(messageChain(e).contains("slice step cannot be zero"))
  }

  test("getDummies beyond maxCategories fails fast with a sizing message") {
    val df = (0 until 40).map(i => s"tok$i").toDF("s")
    val e = intercept[IllegalArgumentException](
      Reshape.getDummies(df, $"s", ",", Seq($"s"), maxCategories = 10))
    assert(e.getMessage.contains("maxCategories"))
  }

  test("knnLsh with probes outside [0, numPlanes] fails fast") {
    val emb = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      Similarity.knnLsh(emb, "v", "id", Seq(0L), k = 1, numPlanes = 4,
        dim = 2, probes = 5))
    assert(e.getMessage.contains("probes"))
  }

  test("sortedNeighborhood with a non-positive window fails fast") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val e = intercept[IllegalArgumentException](
      graft.operators.Fuzzy.sortedNeighborhood(df, "id", "s", w = 0))
    assert(e.getMessage.contains("window"))
  }

  test("groupedPrefixSum without an order column fails fast") {
    val df = Seq(("g", 1L)).toDF("g", "v")
    val e = intercept[IllegalArgumentException](
      graft.operators.Positional.groupedPrefixSum(df, Seq("g"), Seq.empty,
        $"v", "run"))
    assert(e.getMessage.contains("order column"))
  }

  test("IVF-PQ fails fast on rerank < k and nProbe outside [1, |cells|]") {
    val emb = Seq((0L, Seq.fill(8)(1.0)), (1L, Seq.fill(8)(0.5)))
      .toDF("vec_id", "embedding")
    val corpus = Similarity.prepared(emb, "embedding", "vec_id")
    val (cents, cbs) = graft.operators.Ivfpq.train(corpus, nCells = 2,
      m = 2, kSub = 2, lloydIters = 1)
    val e1 = intercept[IllegalArgumentException](
      graft.operators.Ivfpq.knnIvfPqFrom(corpus, cents, cbs, Seq(0L),
        k = 5, nProbe = 1, rerank = 3))
    assert(e1.getMessage.contains("rerank"))
    val e2 = intercept[IllegalArgumentException](
      graft.operators.Ivfpq.knnIvfPqFrom(corpus, cents, cbs, Seq(0L),
        k = 1, nProbe = 99, rerank = 5))
    assert(e2.getMessage.contains("nProbe"))
  }

  test("profile with no columns fails fast") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val e = intercept[IllegalArgumentException](
      graft.operators.Profile.profile(df, Seq.empty))
    assert(e.getMessage.contains("at least one column"))
  }

  test("pageRankFixedPoint with zero iterations fails fast") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      graft.operators.Graph.pageRankFixedPoint(edges, "a", "b", iters = 0))
    assert(e.getMessage.contains("iteration"))
  }

  test("sqrtTemperatureKeep with a non-positive target fails fast") {
    val docs = Seq((1L, "en", "a")).toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException](
      graft.operators.TextOps.sqrtTemperatureKeep(
        docs, "lang", "text", targetDocs = 0L))
    assert(e.getMessage.contains("targetDocs"))
  }

  test("leakageSafeSplit with percentages outside [1,100] fails fast") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val groups = Seq((1L, 1L)).toDF("id", "keeper")
    for ((tr, va) <- Seq((0, 10), (80, 30), (101, 0))) {
      val e = intercept[IllegalArgumentException](
        graft.operators.Dedup.leakageSafeSplit(
          docs, "doc_id", "text", groups, tr, va))
      assert(e.getMessage.contains("trainPct"), s"tr=$tr va=$va")
    }
  }

  test("knnTruncated and rrfFuse fail fast on degenerate sizing") {
    val df = Seq((1L, Seq(0.1f, 0.2f))).toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](
      graft.operators.Similarity.knnTruncated(df, "embedding", "vec_id",
        Seq(1L), k = 3, prefixDim = 2, shortlist = 2))
    assert(e1.getMessage.contains("shortlist"))
    val e2 = intercept[IllegalArgumentException](
      graft.operators.Similarity.knnTruncated(df, "embedding", "vec_id",
        Seq(1L), k = 1, prefixDim = 0, shortlist = 5))
    assert(e2.getMessage.contains("prefixDim"))
    val ranks = Seq((1L, 2L, 1L)).toDF("query_id", "id", "rank")
    val e3 = intercept[IllegalArgumentException](
      graft.operators.Similarity.rrfFuse(ranks, ranks, k = 0))
    assert(e3.getMessage.contains("k >= 1"))
  }

  test("winnowingFingerprints fails fast on non-positive k or w") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    for ((k, w) <- Seq((0, 4), (3, 0))) {
      val e = intercept[IllegalArgumentException](
        graft.operators.TextOps.winnowingFingerprints(docs, "text",
          "doc_id", k, w))
      assert(e.getMessage.contains("k >= 1"), s"k=$k w=$w")
    }
  }

  test("leakageSafeSplit raises on a stale groups table (keeper absent " +
      "from docs) instead of silently dropping the leakage guarantee") {
    val docs = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    // keeper 99 exists in no docs row: id 2's split would silently fall
    // back to its own hash under the old inner-join plan
    val groups = Seq((2L, 99L)).toDF("id", "keeper")
    val e = intercept[Exception](
      graft.operators.Dedup.leakageSafeSplit(
        docs, "doc_id", "text", groups, 80, 10).collect())
    assert(e.getMessage.contains("keeper absent from docs") ||
      Option(e.getCause).exists(_.getMessage.contains(
        "keeper absent from docs")), e.getMessage)
    // the same-frame pipeline (keeper resolvable) is untouched
    val ok = graft.operators.Dedup.leakageSafeSplit(
      docs, "doc_id", "text", Seq((2L, 1L)).toDF("id", "keeper"), 80, 10)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(ok === Map(1L -> false, 2L -> true))
    // a keeper PRESENT in docs with NULL text is not "absent" — but the
    // group hash is undefined (polyHash(NULL) is null), and letting the
    // members fall through to their OWN hashes would scatter one dup
    // group across splits. It must raise the ACCURATE error (keeper text
    // NULL), not the misleading stale-table one.
    val nullDocs = Seq((1L, null.asInstanceOf[String]), (2L, "bb"))
      .toDF("doc_id", "text")
    val e2 = intercept[Exception](graft.operators.Dedup.leakageSafeSplit(
      nullDocs, "doc_id", "text", Seq((2L, 1L)).toDF("id", "keeper"),
      80, 10).collect())
    def msgOf(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(_.getMessage).getOrElse("")
    assert(msgOf(e2).contains("has NULL text"), msgOf(e2))
    assert(!msgOf(e2).contains("keeper absent"), msgOf(e2))
  }
}
