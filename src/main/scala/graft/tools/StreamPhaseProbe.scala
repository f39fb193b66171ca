// Run with: sbt "runMain graft.tools.StreamPhaseProbe"
package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-micro-batch durationMs breakdown of the streaming parity drains
  * (guide §1: measure before touching) — prints each progress entry's
  * phase timings so the per-batch overhead is attributable (planning vs
  * state commit vs addBatch vs offset log). */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs.asScala
        println(f"[batch ${p.batchId}%2d] rows=${p.numInputRows}%6d " +
          d.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" "))
      }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    for (round <- 1 to 2) {
      println(s"=== round $round: q_stream_late_drop ===")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_stream_late_drop")(spark, dir).collect()
      println(f"total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      println(s"=== round $round: q_stream_stream_join ===")
      val t1 = System.nanoTime()
      graft.SparkEntry.queries("q_stream_stream_join")(spark, dir).collect()
      println(f"total ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
