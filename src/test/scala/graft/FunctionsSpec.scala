package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions._
import graft.expressions.ProductAgg.prodAgg

/** Pins the reference's null/edge semantics on constructed data
  * (FIXTURES.md §A/§C; reference tests/test_algorithms.py, test_boolean.py).
  */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def boolCol(vals: Seq[java.lang.Boolean]) =
    vals.toDF("b")

  test("anyNullIsTrue: null counts as True (reference bool.py:22-23)") {
    val df = boolCol(Seq(false, null, false))
    assert(df.agg(anyNullIsTrue($"b")).head.getBoolean(0) === true)
    assert(df.agg(bool_or($"b")).head.getBoolean(0) === false)
  }

  test("allNullSkipped: nulls never falsify (reference bool.py:69)") {
    assert(boolCol(Seq(true, null, true))
      .agg(allNullSkipped($"b")).head.getBoolean(0) === true)
    assert(boolCol(Seq(true, null, false))
      .agg(allNullSkipped($"b")).head.getBoolean(0) === false)
  }

  test("fletcherMean counts nulls in the denominator (reference base.py:504-505)") {
    val df = Seq[java.lang.Double](2.0, null, 4.0).toDF("x")
    val m = df.agg(fletcherMean($"x")).head.getDouble(0)
    assert(m === 2.0, "sum=6 over len=3 (not valid-count 2)")
  }

  test("prodAgg: skipna product, identity 1, partial/final-safe") {
    val df = Seq[java.lang.Double](2.0, null, 3.0, 4.0).toDF("x")
      .repartition(3)
    assert(df.agg(prodAgg($"x")).head.getDouble(0) === 24.0)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("x", DoubleType))))
    assert(empty.agg(prodAgg($"x")).head.getDouble(0) === 1.0)
  }

  test("detSum is partition-order independent") {
    val vals = (1 to 10000).map(i => i * 0.1)
    val a = vals.toDF("x").repartition(1).agg(detSum($"x")).head.getDouble(0)
    val b = vals.reverse.toDF("x").repartition(13).agg(detSum($"x")).head.getDouble(0)
    assert(a === b)
  }

  test("detVarSamp matches var_samp to 1e-9 on well-conditioned data") {
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val got = df.agg(detVarSamp($"x")).head.getDouble(0)
    val ref = df.agg(var_samp($"x")).head.getDouble(0)
    assert(math.abs(got - ref) < 1e-9 * math.abs(ref))
  }

  test("kleene OR/AND truth table") {
    val df = Seq[(java.lang.Boolean, java.lang.Boolean)](
      (true, null), (false, null), (null, null), (true, false))
      .toDF("a", "b")
      .select(kleeneOr($"a", $"b").as("or"), kleeneAnd($"a", $"b").as("and"))
    val rows = df.collect()
    assert(rows(0).getBoolean(0) === true)   // T or N = T
    assert(rows(0).isNullAt(1))              // T and N = N
    assert(rows(1).isNullAt(0))              // F or N = N
    assert(rows(1).getBoolean(1) === false)  // F and N = F
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
    assert(rows(3).getBoolean(0) === true && rows(3).getBoolean(1) === false)
  }

  test("ffill/bfill directional fill") {
    val df = Seq(
      (1, 1L, null: java.lang.Double),
      (1, 2L, java.lang.Double.valueOf(5.0)),
      (1, 3L, null: java.lang.Double),
      (1, 4L, java.lang.Double.valueOf(7.0)),
      (1, 5L, null: java.lang.Double)).toDF("k", "seq", "v")
    val out = df.select($"seq",
      ffill($"v", Seq($"k"), Seq($"seq")).as("f"),
      bfill($"v", Seq($"k"), Seq($"seq")).as("b")).orderBy($"seq").collect()
    assert(out.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq ===
      Seq(null, 5.0, 5.0, 7.0, 7.0))
    assert(out.map(r => if (r.isNullAt(2)) null else r.getDouble(2)).toSeq ===
      Seq(5.0, 5.0, 7.0, 7.0, null))
  }

  test("bfill accepts directional order columns (flip, not double-wrap)") {
    // bfill along DESCENDING seq = fill each null from the next non-null
    // at a SMALLER seq. The running-frame rewrite must flip an explicit
    // SortOrder's direction and null ordering, not append another .desc
    // (which double-wraps the node and fails analysis).
    val df = Seq(
      (1, 1L, null: java.lang.Double),
      (1, 2L, java.lang.Double.valueOf(5.0)),
      (1, 3L, null: java.lang.Double)).toDF("k", "seq", "v")
    val out = df.select($"seq",
        bfill($"v", Seq($"k"), Seq($"seq".desc)).as("b"))
      .orderBy($"seq").collect()
    assert(out.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq ===
      Seq(null, 5.0, 5.0))
  }

  test("textStrip strips the reference's unicode space set") {
    val df = Seq("   hi \t ", "ok").toDF("s")
    assert(df.select(textStrip($"s")).as[String].collect().toSeq ===
      Seq("hi", "ok"))
  }
}

// Positional operator coverage lives in PositionalSpec.scala.
