package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: the z-value's bit math, rank quantization, and — the
  * point of the operator — the measured footer-level pruning win of a
  * z-clustered file set over a single-column sort for predicates on the
  * SECOND dimension. All assertions work off per-file min/max, the exact
  * statistic a parquet reader prunes row groups with.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits (known small cases)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
        (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), bits = 16))
    val z = df.orderBy("x", "y").select("x", "y", "z").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toMap2
    // x contributes even bit positions, y odd ones
    assert(z((0L, 0L)) == 0L)
    assert(z((1L, 0L)) == 1L)
    assert(z((0L, 1L)) == 2L)
    assert(z((1L, 1L)) == 3L)
    // 5=101b, 3=011b -> interleave: x bits at 0,2,4; y bits at 1,3,5
    // x: 1·2^0 + 0·2^2 + 1·2^4 = 17 ; y: 1·2^1 + 1·2^3 + 0·2^5 = 10
    assert(z((5L, 3L)) == 27L)
    // 16 ones in even positions = 0x55555555; odd = 0xAAAAAAAA
    assert(z((65535L, 0L)) == 0x55555555L)
    assert(z((0L, 65535L)) == 0xAAAAAAAAL)
  }

  test("zValue masks out-of-range and negative inputs (total function)") {
    val z = Seq((65536L, -1L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), bits = 16).as("z"))
      .head().getLong(0)
    // 65536 pmod 65536 = 0; -1 pmod 65536 = 65535 -> all odd bits set
    assert(z == 0xAAAAAAAAL)
  }

  test("zValue rejects sizings that would break the mask or the key") {
    // bits = 0 would reduce an empty term list; 1L << 63 is negative, so a
    // 63-bit mask would sign-extend garbage into the key
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("x")), bits = 0)
    }
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("x")), bits = 63)
    }
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("x"), col("y")), bits = 32)
    }
  }

  test("zRank buckets a skewed column into [0, 2^bits) preserving order") {
    val df = (1 to 1000).map(i => i.toLong * i).toDF("v")
    val ranked = df.select(col("v"),
        Layout.zRank(df, "v", bits = 4).as("r"))
      .orderBy("v").collect()
    val rs = ranked.map(_.getLong(1))
    assert(rs.min == 0L && rs.max == 15L)
    assert(rs.sliding(2).forall(p => p(0) <= p(1)), "rank must be monotone")
    // quantile-derived buckets hold ~1/16 of the rows each even though the
    // value distribution is quadratically skewed
    val sizes = rs.groupBy(identity).view.mapValues(_.size).values
    assert(sizes.max <= 80 && sizes.min >= 40,
      s"expected ~62-63 rows per bucket, got min=${sizes.min} max=${sizes.max}")
  }

  test("z-clustered files prune on the second dimension; linear sort cannot") {
    // Raw bit-interleave of columns with UNEQUAL bit-widths degenerates to
    // a lexicographic sort on the wider column (partkey spans 8 bits here,
    // suppkey 4 — every z boundary lands on a partkey bit). The production
    // recipe is rank-quantize each column to the SAME width first, exactly
    // what Delta's OPTIMIZE ZORDER does — so that is what this measures.
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder")
    try {
      val base = tblHelper("lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      val li = base
        .withColumn("pr", Layout.zRank(base, "l_partkey", bits = 3))
        .withColumn("sr", Layout.zRank(base, "l_suppkey", bits = 3))
      val zDir = s"$dir/z"
      val linDir = s"$dir/lin"
      Layout.clusterByZ(li, Seq("pr", "sr"), bits = 3, numFiles = 16)
        .drop("pr", "sr").write.parquet(zDir)
      li.drop("pr", "sr").repartitionByRange(16, $"l_partkey")
        .sortWithinPartitions($"l_partkey").write.parquet(linDir)

      def boxes(d: String): Seq[(Long, Long)] =
        new java.io.File(d).listFiles().toSeq
          .filter(_.getName.endsWith(".parquet"))
          .map { f =>
            val r = spark.read.parquet(f.getAbsolutePath)
              .agg(min($"l_suppkey"), max($"l_suppkey")).head()
            (r.getLong(0), r.getLong(1))
          }

      // a selective box predicate on l_suppkey alone: the bottom 1/8 of
      // the domain (suppkey spans 0..9 at this sf -> suppkey <= 1)
      val (gMin, gMax) = {
        val r = li.agg(min($"l_suppkey"), max($"l_suppkey")).head()
        (r.getLong(0), r.getLong(1))
      }
      val qLo = gMin
      val qHi = gMin + (gMax - gMin) / 8
      def surviving(bs: Seq[(Long, Long)]): Int =
        bs.count { case (lo, hi) => hi >= qLo && lo <= qHi }

      val zB = boxes(zDir)
      val lB = boxes(linDir)
      // range-partition boundaries are sample-derived; a collapsed
      // boundary can merge adjacent files, so pin "close to 16"
      assert(zB.size >= 12 && lB.size >= 12,
        s"expected ~16 files, got z=${zB.size} lin=${lB.size}")
      // the partkey-sorted layout knows nothing about suppkey: every file's
      // suppkey range spans (nearly) the whole domain, so nothing prunes
      assert(surviving(lB) == lB.size,
        s"linear layout unexpectedly pruned: ${lB.size - surviving(lB)} files")
      // the z layout bounds suppkey per file: at least half the files'
      // boxes miss the query box entirely (ideal here is ~3/4 pruned)
      assert(surviving(zB) <= zB.size / 2,
        s"z layout should prune >= half of ${zB.size} files, " +
          s"${surviving(zB)} survive")
    } finally {
      graft.queries.Streaming.deleteRecursively(dir)
    }
  }

  test("compact rewrites a many-small-file table into few full files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
    try {
      val src = s"$dir/small"
      val out = s"$dir/compacted"
      tblHelper("lineitem").repartition(64).write.parquet(src)
      def parquetFiles(d: String) =
        new java.io.File(d).listFiles().toSeq
          .filter(_.getName.endsWith(".parquet"))
      val smallFiles = parquetFiles(src)
      assert(smallFiles.size == 64)
      val totalBytes = smallFiles.map(_.length).sum
      // the scan's file packing would fold 64 KB-scale files into one read
      // partition (openCost packing) and compact would rightly take the
      // repartition path; shrink maxPartitionBytes so the scan yields many
      // partitions and the shuffle-free coalesce branch is what's on trial
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      spark.conf.set("spark.sql.files.openCostInBytes", "16384")
      val reread = spark.read.parquet(src)
      // target a quarter of the input (ceil, so n lands exactly on 4)
      val compacted = Layout.compact(reread, (totalBytes + 3) / 4)
      assert(compacted.rdd.getNumPartitions == 4)
      compacted.write.parquet(out)
      assert(parquetFiles(out).size == 4)
      // a rewrite, not a transformation: contents unchanged
      assert(compacted.count() == reread.count())
      assert(spark.read.parquet(out).select("l_orderkey", "l_linenumber")
        .except(reread.select("l_orderkey", "l_linenumber")).isEmpty)
      // shrink path must be shuffle-free: the logical node is a
      // non-shuffling Repartition (coalesce) — checked on the LOGICAL
      // plan, which the AQE wrapper can't vacuate
      val shuffling = compacted.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.Repartition
          if r.shuffle => r
      }
      assert(shuffling.isEmpty, "compaction shrink must not shuffle")
    } finally {
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.sql.files.openCostInBytes")
      graft.queries.Streaming.deleteRecursively(dir)
    }
  }

  test("compact grows the partition count when files exceed the target") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_grow")
    try {
      val src = s"$dir/big"
      tblHelper("lineitem").coalesce(1).write.parquet(src)
      val total = new java.io.File(src).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
      val grown = Layout.compact(spark.read.parquet(src), total / 8 + 1)
      assert(grown.rdd.getNumPartitions == 8)
    } finally {
      graft.queries.Streaming.deleteRecursively(dir)
    }
  }

  private def tblHelper(name: String) =
    graft.queries.tbl(spark, sf0001, name)

  /** Pair-key map from collected (x, y, z) triples. */
  private implicit class Rows(rs: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rs.map { case (x, y, z) => (x, y) -> z }.toMap
  }
}
