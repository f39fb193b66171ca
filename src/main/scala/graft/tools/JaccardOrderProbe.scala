// Run with: sbt "runMain graft.tools.JaccardOrderProbe"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The r17 weak-item measurement: does the Bayardo frequency-ordered
  * prefix collapse `ngramJaccardPairs`' super-linear shuffle term in the
  * SMJ regime — the regime a 100 TB corpus actually runs in, where no
  * prefix table broadcasts?
  *
  * r17 measured the shipped hash-ordered default at ×4.3 wall / ×18
  * shuffle per ×10 data under a forced sort-merge join (broadcast
  * threshold −1 at both scales) and ATTRIBUTED the super-10× shuffle term
  * to hash-order prefix-selection variance across the synthetic
  * token-disjoint copies — plausible but unproven, while DedupSpec's
  * order-equivalence property says the frequency order is never worse and
  * strictly better on skew. This probe prices both orderings at both
  * scales (wall, shuffle MB, candidate/verified pair counts via
  * JaccardJoinStats) so the default ships on a measurement.
  *
  * Same methodology as Sf1Probe: per-(config, scale) warmup, the timed run
  * is the second at each point; shuffle volume from the executed plan's
  * SQLMetrics (noise-free); broadcast threshold −1 for EVERY run so both
  * orderings and both scales sit in the same join regime.
  */
object JaccardOrderProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = "/root/repo/target/sf1"
    val sf2 = "/root/repo/target/sf2" // ScaleUp copies=20: 2x sf1
    val sf01 = "/root/testdata/sf0.1"
    val spark = ProbeUtil.session()
    // the 100 TB regime: nothing broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)

    def runOnce(dir: String, freq: Boolean): (Double, Double) = {
      val docs = graft.queries.tbl(spark, dir, "documents")
      val t0 = System.nanoTime()
      val df = graft.operators.Dedup.ngramJaccardPairs(docs, "text",
        "doc_id", "source", threshold = 0.5, frequencyOrdered = freq)
      val out = df.agg(
        bit_xor(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*))))
      out.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, PlanMetrics.exchangeVolume(out).shuffleWritten / 1e6)
    }
    def stats(dir: String, freq: Boolean)
        : graft.operators.Dedup.JaccardJoinStats = {
      val docs = graft.queries.tbl(spark, dir, "documents")
      val (res, st) = graft.operators.Dedup.ngramJaccardPairsWithStats(
        docs, "text", "doc_id", "source", threshold = 0.5,
        frequencyOrdered = freq)
      res.unpersist()
      st
    }

    // Per-exchange attribution (hash order, both scales): WHICH exchange
    // carries the super-linear bytes? Prints every ShuffleExchangeExec's
    // bytes/records with its child operator, so "x18 shuffle" decomposes
    // into named plan edges instead of one aggregate.
    def breakdown(dir: String, label: String): Unit = {
      val docs = graft.queries.tbl(spark, dir, "documents")
      val df = graft.operators.Dedup.ngramJaccardPairs(docs, "text",
        "doc_id", "source", threshold = 0.5, frequencyOrdered = false)
      val out = df.agg(
        bit_xor(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*))))
      out.collect()
      PlanMetrics.allNodes(out.queryExecution.executedPlan).foreach {
        case sh: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          val b = sh.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
          val r = sh.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
          val child = sh.child.simpleStringWithNodeId().take(90)
          println(f"[jaccard-exch] $label b=${b / 1e6}%9.2fMB r=$r%,12d <- $child")
        case _ =>
      }
    }

    runOnce(sf01, freq = false) // session-level warmup
    val rows = for (freq <- Seq(false, true)) yield {
      runOnce(sf01, freq)
      val (s01, mb01) = runOnce(sf01, freq)
      runOnce(sf1, freq)
      val (s1, mb1) = runOnce(sf1, freq)
      val st01 = stats(sf01, freq)
      val st1 = stats(sf1, freq)
      val label = if (freq) "freq" else "hash"
      println(f"[jaccard-probe] $label%-4s sf0.1 $s01%6.2fs $mb01%8.2fMB " +
        f"cand=${st01.candidates}%,d ver=${st01.verified}%,d | " +
        f"sf1 $s1%6.2fs $mb1%8.2fMB cand=${st1.candidates}%,d " +
        f"ver=${st1.verified}%,d | x${s1 / s01}%.2f time " +
        f"x${if (mb01 > 0) mb1 / mb01 else 0.0}%.2f shuffle " +
        f"x${st1.candidates.toDouble / math.max(1, st01.candidates)}%.2f cand")
      (label, s01, s1, mb01, mb1, st01, st1)
    }
    breakdown(sf01, "sf0.1")
    breakdown(sf1, "sf1  ")

    // ASYMPTOTE check (the r17->r18 attribution): the x18-bytes-per-x10
    // term decomposed (breakdown above) into ONE edge — the pre-distinct
    // candidate-multiplicity shuffle, whose map-side partial aggregate
    // dedupes perfectly at sf0.1 (547,908 rows emitted = the candidate
    // count), ~86% less at sf1 (35.0M emitted), and not at all at sf2
    // (81.0M = the RAW join multiplicity: candidates x ~7.4 avg shared
    // prefix tokens). Emitted rows are BOUNDED by that raw multiplicity,
    // which is LINEAR in n here (copy-disjoint growth). Measured: sf1 ->
    // sf2 (x2 data) reads ~x2 candidates and shuffle converging on x2
    // from above (x2.17 — sf1's residual dedup inflates the base).
    val sf2Block =
      if (new java.io.File(sf2, "documents.parquet").exists()) {
        runOnce(sf2, freq = false)
        val (s2, mb2) = runOnce(sf2, freq = false)
        val st2 = stats(sf2, freq = false)
        breakdown(sf2, "sf2  ")
        val (_, _, s1h, _, mb1h, _, st1h) = rows.head
        println(f"[jaccard-probe] hash sf1->sf2 (x2 data, both in the " +
          f"degraded partial-agg regime): x${s2 / s1h}%.2f time " +
          f"x${mb2 / mb1h}%.2f shuffle " +
          f"x${st2.candidates.toDouble / st1h.candidates}%.2f cand")
        f""", "hash_sf2": {"sf2_sec": $s2%.3f, "sf2_shuffle_mb": $mb2%.3f, "sf2_candidates": ${
          st2.candidates}, "sf2_verified": ${st2.verified}, "vs_sf1_time": ${
          s2 / s1h}%.2f, "vs_sf1_shuffle": ${mb2 / mb1h}%.2f, "vs_sf1_cand": ${
          st2.candidates.toDouble / st1h.candidates}%.2f, "note": "x2 data with both points in the degraded partial-agg regime - the asymptotic growth law"}"""
      } else ""

    val json = rows.map { case (l, s01, s1, mb01, mb1, st01, st1) =>
      f""""$l": {"sf01_sec": $s01%.3f, "sf1_sec": $s1%.3f, "ratio": ${
        s1 / s01}%.2f, "sf01_shuffle_mb": $mb01%.3f, "sf1_shuffle_mb": $mb1%.3f, "shuffle_ratio": ${
        if (mb01 > 0) mb1 / mb01 else 0.0}%.2f, "sf01_candidates": ${
        st01.candidates}, "sf1_candidates": ${st1.candidates}, "sf01_verified": ${
        st01.verified}, "sf1_verified": ${st1.verified}}"""
    }.mkString("{\"regime\": \"forced SMJ (autoBroadcastJoinThreshold=-1), " +
      "per-(config,scale) warmup, timed run is the second\",\n", ",\n",
      sf2Block + "\n}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/JACCARD_ORDER_PROBE.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
