package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Skew helpers must be drop-in equal to the unsalted spellings. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 90% of fact rows share one hot key
    val fact = spark.range(0, 2000)
      .select((when($"id" % 10 === 0, $"id" % 5).otherwise(0L)).as("k"),
        $"id".as("payload"))
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select($"k", $"payload", $"name")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), saltFactor = 8)
      .select($"k", $"payload", $"name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedDistinctCount equals plain count_distinct per key") {
    val df = spark.range(0, 5000)
      .select(($"id" % 3).as("k"), ($"id" % 217).as("v"))
    val plain = df.groupBy($"k").agg(count_distinct($"v").as("v_distinct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(df, Seq("k"), "v", saltFactor = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salt is deterministic across evaluations (retry-safe)") {
    val fact = spark.range(0, 100).select(lit(0L).as("k"), $"id".as("p"))
    val dim = Seq((0L, "x")).toDF("k", "n")
    val a = Skew.saltedJoin(fact, dim, Seq("k"), 4).collect().toSet
    val b = Skew.saltedJoin(fact, dim, Seq("k"), 4).collect().toSet
    assert(a === b && a.size === 100)
  }
}
