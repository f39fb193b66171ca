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

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // The other half of the skew story: manual salting (above) is the
    // deterministic pre-planned mitigation; AQE's OptimizeSkewedJoin is
    // the runtime one — after the shuffle writes, the oversized partition
    // is split into several reader-tasks (skew=true in the shuffle read).
    // Thresholds are lowered to make the test's MB-scale hot key count as
    // skew; production uses the defaults (256 MB) with the same machinery.
    val kv = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~95% of fact rows share key 0; the uniform side is big enough
      // that neither side broadcasts
      val fact = spark.range(0, 200000)
        .select(when($"id" % 20 === 0, $"id" % 7 + 1).otherwise(0L).as("k"),
          concat(lit("payload_"), $"id").as("p"))
      val dim = spark.range(0, 8).select($"id".as("k"),
        concat(lit("name_"), $"id").as("n"))
        .union(spark.range(0, 20000).select(lit(-1L).as("k"),
          lit("filler").as("n")))
      val joined = fact.join(dim, Seq("k"))
      // drive THIS df's QueryExecution (count() would plan a separate
      // aggregate query and leave joined's adaptive plan unexecuted)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
      assert(finalPlan.contains("skew=true") ||
          finalPlan.contains("AQEShuffleRead skewed"),
        s"AQE did not mark a skewed partition split:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
