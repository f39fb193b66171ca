package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.ArrowInterop

/** Round-trips for the §2.1 ingest/egress boundary ops. */
class ArrowInteropSpec extends SparkTestBase {
  import spark.implicits._

  test("Arrow IPC round-trip preserves schema, values and nulls") {
    val df = Seq(
        (1L, "alpha", Some(1.5), true),
        (2L, "béta", None, false),
        (3L, "", Some(-0.0), true))
      .toDF("id", "name", "score", "flag")
    val bytes = ArrowInterop.toArrow(df)
    assert(bytes.length > 0)
    val back = ArrowInterop.fromArrow(spark, bytes)
    assert(back.schema === df.schema)
    assert(back.orderBy($"id").collect().toSeq ===
      df.orderBy($"id").collect().toSeq)
  }

  test("Arrow egress of a parquet-backed query result") {
    val df = spark.read.parquet(s"$sf0001/nation.parquet")
      .select($"n_nationkey", $"n_name").orderBy($"n_nationkey")
    val back = ArrowInterop.fromArrow(spark, ArrowInterop.toArrow(df))
    assert(back.count() === df.count())
    assert(back.orderBy($"n_nationkey").collect().head ===
      df.collect().head)
  }

  test("empty DataFrame round-trips with schema intact") {
    val df = Seq((1, "x")).toDF("a", "b").filter(lit(false))
    val back = ArrowInterop.fromArrow(spark, ArrowInterop.toArrow(df))
    assert(back.schema === df.schema)
    assert(back.count() === 0)
  }

  test("fromSequence ingests a typed sequence distributed") {
    val ds = ArrowInterop.fromSequence(spark, Seq("a" -> 1, "b" -> 2))
    assert(ds.rdd.getNumPartitions >= 1)
    assert(ds.toDF("k", "v").agg(sum($"v")).head.getLong(0) === 3)
    assert(ArrowInterop.toLocalSeq(ds).toSet === Set("a" -> 1, "b" -> 2))
  }
}
