// Run with: sbt "runMain graft.tools.DupGroupsProbe"  (defaults to sf0.1)
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** One-off scale rehearsal of the DISTRIBUTED dup-groups branch: runs the
  * full minhash-pair pipeline at the given SF with `driverEdgeLimit = 0`
  * (forcing the min-label + pointer-jump loop) and prints edge count,
  * rounds executed, and wall time — the numbers PROGRESS.md pins so the
  * O(log diameter) claim is measured, not asserted. The per-round spec
  * bound lives in DedupSpec ("10^4 chain"); the recurring wall-clock gate
  * is the q_pipe_dup_groups_dist bench query.
  */
object DupGroupsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.minhashDupPairs(docs, "text", "doc_id",
        k = 3, threshold = 0.8)
      .filter(col("is_dup")).select(col("id1"), col("id2"))
      .persist()
    val nEdges = pairs.count()
    val t0 = System.nanoTime()
    val (groups, rounds) =
      Dedup.dupGroupsWithStats(pairs, driverEdgeLimit = 0)
    val nVerts = groups.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"{\"sf\":\"$sfDir\",\"edges\":$nEdges,\"vertices\":$nVerts," +
      f"\"rounds\":$rounds,\"wall_sec\":$wall%.2f}")
    pairs.unpersist()
    spark.stop()
  }
}
