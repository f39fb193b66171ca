package graft.tools
import org.apache.spark.sql.SparkSession
object CandProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (res, st) = graft.operators.Dedup.ngramJaccardPairsWithStats(
      docs, "text", "doc_id", "source", 0.5)
    println(s"[candprobe] hash order: candidates=${st.candidates} verified=${st.verified}")
    res.unpersist()
    spark.stop()
  }
}
