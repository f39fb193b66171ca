package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
/** Debug CLI: per-exchange SQLMetric readout for one gate query.
  *
  * `runMain graft.tools.ProbeShuffle <query> <sfdir>` prints every shuffle
  * exchange (bytes/records written) and broadcast exchange (dataSize, with
  * the child node that fed it) of the executed plan — the drill-down for a
  * queries_shuffle_mb / queries_broadcast_mb anomaly in the bench artifact.
  * See graft.tools.PlanMetrics for what the numbers mean (and the
  * page-quantization caveat on broadcast dataSize).
  */
object ProbeShuffle {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0); val dir = args(1)
    val df0 = graft.SparkEntry.queries(name)(spark, dir)
    val df = df0.agg(bit_xor(xxhash64(struct(df0.columns.toIndexedSeq.map(col): _*))))
    df.collect()
    PlanMetrics.allNodes(df.queryExecution.executedPlan).foreach {
      case n: BroadcastExchangeExec =>
        println(f"BROADCAST dataSize=${n.metrics.get("dataSize").map(_.value).getOrElse(-1L)}%,d  child=${n.child.getClass.getSimpleName} ${n.child.simpleStringWithNodeId()}")
      case n: ShuffleExchangeExec =>
        println(f"SHUFFLE bytes=${n.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(-1L)}%,d rec=${n.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(-1L)}%,d  child=${n.child.getClass.getSimpleName}")
      case _ =>
    }
    spark.stop()
  }
}
