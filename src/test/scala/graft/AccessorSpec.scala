package graft

import org.apache.spark.sql.functions._
import graft.accessor.syntax._

/** Pins the ergonomic accessor surface (reference fr_str/fr_strx accessors
  * + the `_reduce` dispatcher): each method must resolve and agree with the
  * underlying function it forwards to.
  */
class AccessorSpec extends SparkTestBase {
  import spark.implicits._

  test("string accessor methods forward to the engine expressions") {
    val df = Seq("a+b+c", "Hello").toDF("s")
    val out = df.select(
        $"s".strCount("+").as("cnt"),
        $"s".strReplace("+", "-", 1).as("rep"),
        $"s".strRFind("+").as("rf"),
        $"s".strRPartition("+", 2).as("tail"),
        $"s".strSliceReplace("X", 1, 3).as("sr"),
        $"s".strSwapCase().as("sw"),
        $"s".strIsAlpha().as("alpha"))
      .collect()
    assert(out(0).getInt(0) === 2)
    assert(out(0).getString(1) === "a-b+c")
    assert(out(0).getInt(2) === 3)
    assert(out(0).getString(3) === "c")
    assert(out(0).getString(4) === "aX+c")   // s[:1] + "X" + s[3:]
    assert(out(1).getString(5) === "hELLO")
    assert(out(1).getBoolean(6) === true)
  }

  test("reduce dispatcher covers the reference reduction names") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    def red(name: String): Double =
      df.agg($"x".reduce(name).cast("double")).head.getDouble(0)
    assert(red("sum") === 10.0)
    assert(red("mean") === 2.5)
    assert(red("min") === 1.0)
    assert(red("max") === 4.0)
    assert(red("prod") === 24.0)
    assert(red("median") === 2.5)
    assert(math.abs(red("var") - 5.0 / 3) < 1e-12)
    assertThrows[IllegalArgumentException](df.select($"x".reduce("nope")))
  }

  test("null-handling and Kleene accessors") {
    val df = Seq((Some(true), Option.empty[Boolean]), (None, Some(false)))
      .toDF("a", "b")
    val r = df.select(
        $"a".kleeneOr($"b").as("or"),
        $"a".kleeneAnd($"b").as("and"),
        $"a".isNa.as("na"),
        $"a".fillNa(lit(false)).as("filled"))
      .collect()
    assert(r(0).getBoolean(0) === true)    // true OR null = true (Kleene)
    assert(r(0).isNullAt(1))               // true AND null = null
    assert(r(1).getBoolean(3) === false)   // fillNa
  }

  test("DataFrame-level accessors forward to the temporal operators") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 8L, 2.0)).toDF("k", "rt", "v")
    val asof = left.asofJoin(right, Seq("k"), "t", "rt", Seq("v")).collect()
    assert(asof.head.getAs[Double]("asof_v") === 2.0)
    val iv = Seq((1L, 5L, 15L, 7L)).toDF("k", "s", "e", "ivid")
    assert(left.rangeJoin(iv, Seq("k"), "t", "s", "e", 10L).count() === 1)
    val sess = Seq((1L, 0L), (1L, 500L)).toDF("u", "t")
      .sessionize(Seq("u"), "t", gap = 100L).collect()
    assert(sess.map(_.getLong(2)).toSet === Set(1L, 2L))
    val docs = Seq((1L, "aaa", "en")).toDF("id", "text", "lang")
    assert(docs.stratifiedSample($"text", $"lang", Map("en" -> 1.0), 0.0)
      .count() === 1)
    val corpus = Seq(
        (1L, "the cat and the dog is in a house of wonders"),
        (2L, "unrelated eval text entirely different here now today ok fine"))
      .toDF("doc_id", "text")
    val rec = corpus.cleanCorpus("text", "doc_id", isEval = $"doc_id" === 2L)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(rec === Map(1L -> true, 2L -> false))
  }

  test("DataFrame-level accessors forward to resample and fuzzy join") {
    val ev = Seq((1L, 0L, 2.0), (1L, 250L, 4.0)).toDF("u", "t", "v")
    val rs = ev.resample("u", "t", stepNs = 100L, "v")
    assert(rs.count() === 3) // buckets 0, 100 (gap), 200
    assert(ev.resampleInterp("u", "t", 100L, "v")
      .where($"bucket_ns" === 100L).select($"v_interp")
      .head().getDouble(0) === 3.0)
    val names = Seq((1L, "abc"), (2L, "abd"), (3L, "zzz")).toDF("id", "s")
    val pairs = names.fuzzySelfJoin("id", "s")
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("DataFrame-level accessors forward to SNM, profile, prefix sum, " +
      "and the CDC merges") {
    val names = Seq((1L, "abc"), (2L, "abd"), (3L, "zzz")).toDF("id", "s")
    assert(names.sortedNeighborhoodJoin("id", "s", w = 2)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet ===
      Set((1L, 2L)))
    val prof = names.profile(Seq("id")).head()
    assert(prof.getLong(1) === 3L && prof.getLong(3) === 3L)
    val run = Seq(("a", 1L, 10L), ("a", 2L, 5L)).toDF("g", "o", "v")
      .groupedPrefixSum(Seq("g"), Seq($"o"), $"v", "run")
      .orderBy($"o").select($"run").as[Long].collect().toSeq
    assert(run === Seq(10L, 15L))
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val upd = Seq((2L, "B")).toDF("k", "v")
    assert(base.upsert(upd, "k").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "B")))
    val b2 = Seq((1L, 10L, "new")).toDF("k", "t", "v")
    val late = Seq((1L, 5L, "old")).toDF("k", "t", "v")
    assert(b2.upsertLatest(late, "k", Seq("t"))
      .as[(Long, Long, String)].head() === ((1L, 10L, "new")))
    val scd = Seq((1L, 10L, "v1"), (1L, 20L, "v2")).toDF("k", "t", "v")
      .scd2("k", "t", Seq("v"), horizon = 99L)
      .select($"v", $"valid_from", $"valid_to")
      .as[(String, Long, Long)].collect().toSet
    assert(scd === Set(("v1", 10L, 19L), ("v2", 20L, 99L)))
    assert(base.snapshotDiff(upd.unionByName(Seq((1L, "a")).toDF("k", "v")),
        "k", Seq("v"))
      .select($"k", $"change").as[(Long, String)].collect().toSet ===
      Set((2L, "changed")))
  }
}
