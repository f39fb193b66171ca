package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.RegexAnchorSimplification

/** The Catalyst extension path: the anchored-RLIKE rule rewrites to
  * pushdown-eligible predicates without changing results, and the
  * SparkSessionExtensions entry point installs rule + SQL functions into a
  * fresh session.
  */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("RegexAnchorSimplification rewrites start-anchored literals exactly") {
    val df = spark.read.parquet(s"$sf0001/part.parquet")
    val q = df.filter($"p_name".rlike("^blue"))
    val after = RegexAnchorSimplification(q.queryExecution.optimizedPlan)
    val s = after.toString
    assert(!s.toLowerCase.contains("rlike"), s)
    assert(s.contains("StartsWith") || s.contains("startswith"), s)
    // and the rewrite is semantics-preserving
    val rewritten = org.apache.spark.sql.graft.Bridge.planToDf(spark, after)
    assert(rewritten.count() === q.count())
  }

  test("end-anchored patterns are NOT rewritten ($ matches before \\n)") {
    // "abc\n" RLIKE 'abc$' is TRUE in Java regex — endswith would flip it
    assert(Seq("abc\n").toDF("s").filter($"s".rlike("abc$")).count() === 1)
    val df = spark.read.parquet(s"$sf0001/part.parquet")
    val q = df.filter($"p_brand".rlike("#13$") || $"p_type".rlike("^ECONOMY$"))
    val after = RegexAnchorSimplification(q.queryExecution.optimizedPlan)
    assert(after.toString.toUpperCase.contains("RLIKE"), after.toString)
  }

  test("non-literal or unanchored patterns are left alone") {
    val df = spark.read.parquet(s"$sf0001/part.parquet")
    val q = df.filter($"p_name".rlike("b.ue") || $"p_name".rlike("^bl[u]e"))
    val after = RegexAnchorSimplification(q.queryExecution.optimizedPlan)
    assert(after.toString.toUpperCase.contains("RLIKE"), after.toString)
  }

  test("GraftSparkExtensions installs rule + SQL functions in a new session") {
    val prev = spark  // keep the shared session's context alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .withExtensions(new graft.plans.GraftSparkExtensions)
        .getOrCreate()
      // SQL functions resolve without manual registration
      assert(s2.sql("SELECT graft_count('aaaa', 'aa')").head.getInt(0) === 2)
      assert(s2.sql("SELECT graft_polyhash('abc')").head.getLong(0) ===
        graft.expressions.StringKernels.polyHash(
          org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
      // optimizer rule active: anchored rlike disappears from the plan
      val plan = s2.range(1).selectExpr("CAST(id AS STRING) AS s")
        .filter(org.apache.spark.sql.functions.col("s").rlike("^1"))
        .queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("rlike"), plan)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
