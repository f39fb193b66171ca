// Run with: sbt "runMain graft.tools.ExplainOne <query>[,<query>...]"
// Writes $SPARK_GRAFT_PLAN_DIR/<query>_<SPARK_GRAFT_PLAN_TAG>.txt
// (defaults: plans/r20, tag "plan").
package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries under the BENCH session
  * config (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, AQE on —
  * the plans the bench actually times, unlike DumpPlans' static-audit
  * config). Used by the r19 optimization round for before/after plan
  * evidence (guide §1/§7.2). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(
      sys.error("usage: ExplainOne <query>[,<query>...]")).split(',').toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "plan")
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r20")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val out = java.nio.file.Paths.get(s"$planDir/${name}_$tag.txt")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, txt)
      println(s"[explain] wrote $out (${txt.length} chars)")
    }
    spark.stop()
  }
}
