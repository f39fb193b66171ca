// Run with: sbt "runMain graft.tools.RecallProbe [sfDir ...]"
package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the 40-query recall panel (queries.Similarity.recallVsBrute —
  * the exact numbers the bench emits as `queries_recall`) for each given
  * sf directory. The iteration tool behind ANN operating-point sizing:
  * the panel is deterministic per dataset, so a printed value IS the
  * value the next round's bench will report — size probes/tables/bits
  * here instead of discovering a recall inversion in the round artifact.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val rec = graft.queries.Similarity.recallVsBrute(spark, dir)
      println(s"== $dir ==")
      rec.toSeq.sortBy(_._1).foreach { case (n, v) =>
        println(f"  $n%-24s $v%.3f") }
    }
    spark.stop()
  }
}
