// Run with: sbt "runMain graft.tools.AnnPhaseProbe"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the PQ/IVF-PQ gates (guide §1: measure first):
  * prepare/persist, corpus count, codebook training, and the search plan,
  * each timed separately over repeated runs so the warm-path cost —
  * what the bench's min-stat reports — is attributable to a phase. */
object AnnPhaseProbe {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val emb = graft.queries.tbl(spark, dir, "embeddings")
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val corpus = time("prepared+persist") {
        val c = graft.operators.Similarity.prepared(emb, "embedding", "vec_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val n = time("count")(corpus.count())
      val cbs = time("trainCodebooks m=16 k=32")(
        graft.operators.Pq.trainCodebooks(corpus, 16, 32, lloydIters = 2))
      val q = (0 until 4).map(i => 1L + 12L * i)
      val rr = graft.operators.Pq.rerankBreadthSublinear(n, 5)
      val plan = time("knnPqFrom build")(
        graft.operators.Pq.knnPqFrom(corpus, cbs, q, 5, rerank = rr))
      time("knnPqFrom execute")(
        plan.agg(bit_xor(xxhash64(struct(plan.columns.toIndexedSeq
          .map(col): _*)))).collect())
      // ivfpq phases
      val (cents, cbs2) = time("ivfpq train")(
        graft.operators.Ivfpq.train(corpus, 8, 8, 32, lloydIters = 2))
      val plan2 = time("knnIvfPqFrom build")(
        graft.operators.Ivfpq.knnIvfPqFrom(corpus, cents, cbs2, q, 5, 4,
          graft.operators.Pq.rerankBreadth(n, 5)))
      time("knnIvfPqFrom execute")(
        plan2.agg(bit_xor(xxhash64(struct(plan2.columns.toIndexedSeq
          .map(col): _*)))).collect())
      corpus.unpersist()
    }
    spark.stop()
  }
}
