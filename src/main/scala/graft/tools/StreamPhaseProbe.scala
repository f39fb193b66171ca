// Run with: sbt "runMain graft.tools.StreamPhaseProbe"
// Optional: SPARK_GRAFT_PROBE_GATES=q_stream_stream_join,... to pick gates.
package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-micro-batch durationMs breakdown of the streaming parity drains
  * (guide §1: measure before touching) — prints each progress entry's
  * phase timings so the per-batch overhead is attributable (planning vs
  * state commit vs addBatch vs offset log), plus each state operator's
  * commit/update timings and custom metrics (for RocksDB: load/commit
  * sub-phases), so the inside of addBatch is attributable too.
  */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val gates = sys.env.get("SPARK_GRAFT_PROBE_GATES")
      .map(_.split(',').map(_.trim).toSeq)
      .getOrElse(Seq("q_stream_late_drop", "q_stream_stream_join"))
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
        p.stateOperators.zipWithIndex.foreach { case (so, i) =>
          val cm = so.customMetrics.asScala.toSeq.filter(_._2 != 0)
            .sortBy(-_._2).take(12)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(f"  [state $i] ${so.operatorName} rows=${so.numRowsTotal} " +
            s"commitMs=${so.commitTimeMs} $cm")
        }
      }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    for (round <- 1 to 2; g <- gates) {
      println(s"=== round $round: $g ===")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(g)(spark, dir).collect()
      println(f"total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
