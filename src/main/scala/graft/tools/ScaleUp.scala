// Run with: sbt "runMain graft.tools.ScaleUp [srcDir dstDir copies]"
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a linearly scaled-up copy of a driver testdata directory
  * (default: sf0.1 × 10 → target/sf1) for the super-linear-tail probe
  * ([[Sf1Probe]]). /root/testdata is read-only and ships no sf1, so the
  * probe data lives under the repo's target/.
  *
  * Each fact table is unioned `copies` times with SALTED identity: ids
  * shift by copy·(max+1) so copies never collide, and content that drives
  * similarity/dedup operators is made copy-disjoint — document tokens get
  * a per-copy suffix and embeddings rotate by the copy index — so a gate's
  * candidate-pair structure scales linearly with volume instead of
  * exploding on 10 exact clones of every row (which would measure a
  * clone-armageddon stress case, not scale-up). Copy 0 is byte-identical
  * to the source. Small dimension tables (region/nation/part/supplier)
  * copy through unscaled; customer scales with orders so o_custkey keeps
  * resolving.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    def scaled(t: String)(salt: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      val out = (0 until copies).map(i => salt(base, i)).reduce(_ union _)
      write(out, t)
      println(s"[scaleup] $t x$copies")
    }

    // documents: ids shift; tokens of copy>0 get a '~i' suffix (keeps
    // per-doc token counts/lengths ~constant, makes copies Jaccard/
    // minhash/shingle-disjoint); n_chars re-derived from the new text
    val docShift = maxOf(read("documents"), "doc_id")
    scaled("documents") { (df, i) =>
      val text = if (i == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"~$i"))), " ")
      df.select((col("doc_id") + lit(i * docShift)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }

    // embeddings: ids shift; vectors rotate by copy index (same norm and
    // coordinate distribution, copy-disjoint neighborhoods)
    val vecShift = maxOf(read("embeddings"), "vec_id")
    scaled("embeddings") { (df, i) =>
      val dim = df.select(size(col("embedding"))).head().getInt(0)
      val rot = i % dim
      val emb = if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), 1, rot))
      df.select((col("vec_id") + lit(i * vecShift)).as("vec_id"),
        emb.as("embedding"), col("label"))
    }

    // events: event/user ids shift, time range unchanged — 10x the keys
    // and rows per window, the load shape that grows streaming state
    val evShift = maxOf(read("events"), "event_id")
    val userShift = maxOf(read("events"), "user_id")
    scaled("events") { (df, i) =>
      df.select((col("event_id") + lit(i * evShift)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * userShift)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }

    // lineitem + orders share the orderkey shift so joins keep resolving;
    // customer scales with the custkey shift for the same reason
    val okShift = maxOf(read("orders"), "o_orderkey")
    // shift derives from the key's OWNER table: max(o_custkey) can sit
    // below max(c_custkey) when the highest-key customer has no orders,
    // and an undersized shift would collide copy 1's customer keys with
    // copy 0's tail and fan out every orders->customer join at sf1
    val ckShift = maxOf(read("customer"), "c_custkey")
    scaled("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * okShift))
    }
    scaled("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * okShift))
        .withColumn("o_custkey", col("o_custkey") + lit(i * ckShift))
    }
    scaled("customer") { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * ckShift))
    }

    for (t <- Seq("region", "nation", "supplier", "part"))
      { write(read(t), t); println(s"[scaleup] $t passthrough") }
    spark.stop()
  }
}
