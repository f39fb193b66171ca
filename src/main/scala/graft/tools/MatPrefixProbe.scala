// Run with: sbt "runMain graft.tools.MatPrefixProbe"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 verdict item 5: sweep the matryoshka PREFIX WIDTH (the last
  * unswept knob after the r17 floor sweep showed the shortlist floor
  * inert at scale). Arms: the shipped 32-of-64 plus 40 and 48, at sf0.1
  * and sf1, on the 40-query recall panel vs exact brute.
  *
  * The decision metric is recall per SCANNED BYTE: the matryoshka scan
  * reads prefixDim of Dim doubles per corpus row (the whole point of the
  * operator is paying a fraction of the scan), so each arm's scan cost is
  * prefixDim/64 of brute. The shortlist (max(16k, 2⌈√n⌉) exact re-rank
  * rows) is identical across arms — only the prefix fraction moves.
  * MatryoshkaLayoutSpec pins the byte arithmetic this probe's scan_frac
  * column uses.
  */
object MatPrefixProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = "/root/repo/target/sf1"
    val sf01 = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = graft.queries.Similarity.K
    val panel = graft.queries.Similarity.RecallPanel
    val dims = Seq(graft.queries.Similarity.MatPrefixDim, 40, 48)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    val rows = for (dir <- Seq(sf01, sf1)) yield {
      val emb = graft.queries.tbl(spark, dir, "embeddings")
      val n = emb.count()
      val shortlist = graft.queries.Similarity.matShortlistFor(n)
      val brute = topSets(graft.operators.Similarity.knnBrute(
        emb, "embedding", "vec_id", panel, k))
      val arms = dims.map { pd =>
        val ann = topSets(graft.operators.Similarity.knnTruncated(
          emb, "embedding", "vec_id", panel, k, pd, shortlist))
        val recall = brute.toSeq.map { case (q, b) =>
          ann.getOrElse(q, Set.empty).intersect(b).size.toDouble / b.size
        }.sum / brute.size
        val scanFrac = pd / 64.0
        println(f"[mat-prefix] ${new java.io.File(dir).getName}%-6s n=$n " +
          f"prefix=$pd shortlist=$shortlist recall=$recall%.3f " +
          f"scan_frac=$scanFrac%.3f recall/frac=${recall / scanFrac}%.3f")
        (pd, recall, scanFrac)
      }
      (new java.io.File(dir).getName, n, shortlist, arms)
    }
    val json = rows.map { case (sf, n, shortlist, arms) =>
      val armJson = arms.map { case (pd, r, f) =>
        f"""{"prefix_dim": $pd, "recall": $r%.3f, "scan_frac": $f%.3f, "recall_per_frac": ${r / f}%.3f}"""
      }.mkString("[", ", ", "]")
      s""""$sf": {"n": $n, "shortlist": $shortlist, "arms": $armJson}"""
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/MAT_PREFIX_PROBE.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
