package graft

import java.nio.file.{Files, Paths}

/** Staging hygiene for the streaming replay scratch area: the stage key is
  * (source+variant, fingerprint) where the fingerprint is the source file's
  * size+mtime, so a REGENERATED source gets a fresh staged directory — and
  * the stale fingerprints of the same source+variant must be GC'd at that
  * moment, or /tmp/graft_stream_stage accretes one dead multi-file copy of
  * the events table per data regeneration, forever. */
class StagingSpec extends SparkTestBase {

  test("re-staging a regenerated events source GCs the stale staged copy") {
    val dir = Files.createTempDirectory("graft-stage-gc")
    val src = dir.resolve("events.parquet")
    Files.copy(Paths.get(s"$sf0001/events.parquet"), src)

    val multi1 = graft.queries.Streaming.stageEventsMulti(spark, dir.toString)
    try {
      assert(Files.exists(Paths.get(multi1).resolve(".staged")))

      // "regenerate" the source: same path, new fingerprint (mtime bump)
      assert(src.toFile.setLastModified(
        Files.getLastModifiedTime(src).toMillis + 60000))
      val multi2 =
        graft.queries.Streaming.stageEventsMulti(spark, dir.toString)

      assert(multi1 != multi2, "regenerated source must get a fresh key")
      assert(!Files.exists(Paths.get(multi1)),
        s"stale staged copy $multi1 not GC'd on re-stage")
      assert(Files.exists(Paths.get(multi2).resolve(".staged")))

      // the three replay files are present and carry canonical BIGINT ts
      val staged = spark.read.parquet(multi2)
      assert(staged.schema("ts").dataType ===
        org.apache.spark.sql.types.LongType)
      val n = spark.read.parquet(src.toString).count()
      assert(staged.count() === n, "staged replay must cover every event")
    } finally {
      // this spec's source lives in a per-run temp dir, so no later run's
      // GC could ever match its prefix — clean up our own staged copies
      for (p <- Seq(multi1).map(Paths.get(_)) ++
          Seq(graft.queries.Streaming.stageEventsMulti(spark, dir.toString))
            .map(Paths.get(_)) if Files.exists(p))
        graft.queries.Streaming.deleteRecursively(p)
    }
  }
}
