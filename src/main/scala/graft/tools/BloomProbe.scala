package graft.tools
import org.apache.spark.sql.SparkSession
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("x")
    df.createOrReplaceTempView("t")
    try {
      val b = spark.sql(
        "SELECT bloom_filter_agg(xxhash64(x), 100L, 1024L) AS bf FROM t")
      b.createOrReplaceTempView("bf")
      val hit = spark.sql(
        "SELECT x, might_contain((SELECT bf FROM bf), xxhash64(x)) AS h " +
        "FROM t").collect()
      println("PROBE bloom OK: " + hit.mkString(","))
    } catch { case e: Throwable => println("PROBE bloom FAIL: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
