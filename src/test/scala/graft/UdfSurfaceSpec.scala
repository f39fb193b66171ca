package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.UdfSurface.applyBinaryStr

/** Pins the user-extension surface (reference string.py:1046-1119):
  * element-wise binary string functions with automatic null propagation.
  */
class UdfSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  test("applyBinaryStr: scalar-returning function over two string columns") {
    // shared-prefix length — the kind of kernel a user would jit in the
    // reference (tests exercise text_algorithms-style funcs)
    val prefixLen = (a: UTF8String, b: UTF8String) => {
      val x = a.toString; val y = b.toString
      var i = 0
      while (i < math.min(x.length, y.length) && x(i) == y(i)) i += 1
      i
    }
    val df = Seq(("flatmap", "flatten"), ("spark", "sql"), ("", "x"))
      .toDF("a", "b")
    val out = df.select(applyBinaryStr($"a", $"b", IntegerType)(prefixLen))
      .as[Int].collect()
    assert(out.toSeq === Seq(4, 1, 0))
  }

  test("applyBinaryStr: string-returning function") {
    val interleave = (a: UTF8String, b: UTF8String) =>
      UTF8String.fromString(
        a.toString.zipAll(b.toString, ' ', ' ').map { case (x, y) => s"$x$y" }
          .mkString.trim)
    val df = Seq(("abc", "123")).toDF("a", "b")
    val out = df.select(applyBinaryStr($"a", $"b", StringType)(interleave))
      .as[String].head()
    assert(out === "a1b2c3")
  }

  test("applyBinaryStr: nulls propagate (validity-bitmap AND semantics)") {
    val df = Seq(("a", Option("b")), ("c", None))
      .toDF("a", "b")
    val safe = (a: UTF8String, b: UTF8String) => a.numChars() + b.numChars()
    val vals = df.select(applyBinaryStr($"a", $"b", IntegerType)(safe))
      .collect()
    assert(!vals(0).isNullAt(0) && vals(0).getInt(0) === 2)
    assert(vals(1).isNullAt(0))
  }

  test("applyBinaryStr runs distributed over parquet-backed scans") {
    val df = spark.read.parquet(s"$sf0001/part.parquet")
    val out = df.select(
        applyBinaryStr($"p_name", $"p_type", IntegerType)(
          (a, b) => a.numChars() + b.numChars()).as("n"),
        (length($"p_name") + length($"p_type")).as("expect"))
    assert(out.filter($"n" =!= $"expect").count() === 0)
  }
}
