package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (approximate-nearest-neighbor surface).
  *
  * Scale design: the query set is broadcast (never shuffles the corpus);
  * brute force is one narrow scan per corpus partition; the LSH variant
  * prunes candidates to one signature bucket (2^planes fan-in reduction)
  * before scoring. Dot products are sequential left-folds in double — the
  * deterministic, oracle-reproducible kernel (see DuckFrag.dotSql).
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Corpus with v = embedding widened to double and its precomputed norm. */
  def prepared(emb: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    emb.select(col(idCol).as("id"), v.as("v")).withColumn("nrm", norm(col("v")))
  }

  /** Brute-force top-k cosine neighbors for the query ids.
    * One broadcast join + per-query TakeOrdered — the exact baseline. */
  def knnBrute(emb: DataFrame, vecCol: String, idCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = prepared(emb, vecCol, idCol)
    val queries = corpus.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = corpus.join(broadcast(queries), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qv"), col("qn"), col("v"), col("nrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn")
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * Exact quadratic kernel; block with [[lshBucket]] first at scale. */
  def cosineNearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val corpus = prepared(emb, vecCol, idCol)
    corpus.as("a").join(corpus.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        cosine(col("a.v"), col("a.nrm"), col("b.v"), col("b.nrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Deterministic pseudo-random hyperplanes: w(p,i) derives from a Knuth
    * multiplicative hash of (p, i) — reproducible in any engine, no RNG
    * state. Components in [-1, 1]. */
  def planes(numPlanes: Int, dim: Int): Seq[Array[Double]] =
    (0 until numPlanes).map { p =>
      Array.tabulate(dim) { i =>
        (((p.toLong * dim + i) * 2654435761L % 2147483647L % 2001L) - 1000L) / 1000.0
      }
    }

  /** Signed-random-projection LSH bucket id (one bit per hyperplane). */
  def lshBucket(v: Column, ps: Seq[Array[Double]]): Column =
    ps.zipWithIndex.map { case (w, p) =>
      val lw = array(w.map(lit): _*)
      when(dot(v, lw) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style ANN: partition the corpus into `numCentroids` cells by
    * nearest centroid, probe only the query's cell. Centroid selection here
    * is the deterministic "first n ids" seed (cross-engine reproducible;
    * production would plug k-means|| — the cell-assign/probe machinery is
    * identical). Cell assignment is a broadcast of the tiny centroid set +
    * a per-id window, so the corpus shuffles once on (id). */
  def knnIvf(emb: DataFrame, vecCol: String, idCol: String,
      queryIds: Seq[Long], k: Int, numCentroids: Int): DataFrame = {
    val corpus = prepared(emb, vecCol, idCol)
    val cents = corpus.filter(col("id") < numCentroids)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy(col("id"))
      .orderBy(col("cos_c").desc, col("cid"))
    val assigned = corpus.join(broadcast(cents))
      .withColumn("cos_c", cosine(col("v"), col("nrm"), col("cv"), col("cnrm")))
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select(col("id"), col("v"), col("nrm"), col("cid").as("cell"))
    val queries = assigned.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell").as("qcell"))
    val scored = assigned.join(broadcast(queries),
        col("cell") === col("qcell") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qv"), col("qn"), col("v"), col("nrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn")
  }

  /** ANN top-k via LSH bucket pruning: candidates sharing the query's
    * bucket — or, with `probes` > 0, any bucket within Hamming distance 1
    * obtained by flipping one of the first `probes` plane bits (multi-probe
    * LSH: recovers neighbors that fall just across a hyperplane, the main
    * recall loss of single-bucket LSH). The probe expansion happens on the
    * tiny broadcast query side; the corpus still joins by bucket equality. */
  def knnLsh(emb: DataFrame, vecCol: String, idCol: String,
      queryIds: Seq[Long], k: Int, numPlanes: Int, dim: Int,
      probes: Int = 0): DataFrame = {
    require(probes >= 0 && probes <= numPlanes, "probes in [0, numPlanes]")
    val ps = planes(numPlanes, dim)
    val corpus = prepared(emb, vecCol, idCol)
      .withColumn("bucket", lshBucket(col("v"), ps))
    val probeBuckets = array((col("bucket") +:
      (0 until probes).map(p => col("bucket").bitwiseXOR(lit(1L << p)))): _*)
    val queries = corpus.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), explode(probeBuckets).as("qbucket"))
    val scored = corpus.join(broadcast(queries),
        col("bucket") === col("qbucket") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qv"), col("qn"), col("v"), col("nrm")).as("cosine"))
    // no dedup needed: a corpus row has ONE bucket and the probe set per
    // query is distinct values, so each (query, neighbor) matches once
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn")
  }
}
