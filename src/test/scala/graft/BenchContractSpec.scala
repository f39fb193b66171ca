package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench artifact's driver contract: every emitted line must be
  * standalone-parseable JSON (r9/r10 lost rounds to lines the driver's
  * bounded stdout tail clipped mid-object) and the FINAL line must stay
  * small enough that any sane tail grab contains it whole. Builders are
  * pure functions extracted from Bench.main; the real sf0.1 artifact in
  * bench_times.json is additionally parsed when present.
  */
class BenchContractSpec extends AnyFunSuite {
  private val om = new ObjectMapper()

  private val qs = (1 to 120)
    .map(i => s"\"q_example_$i\":${i * 0.01}").mkString("{", ",", "}")
  private val recall = """{"q_sim_knn_sq8":0.75}"""

  test("tiny final line: parseable, carries totals+failed+detail, < 512 B") {
    val line = Bench.tinyLine("69.1", "min_of_3x2", 118, "[]",
      "/root/testdata/sf0.1", "bench_times.json", "1.2345")
    assert(line.length < 512, s"tiny line must survive a tail grab: $line")
    val node = om.readTree(line)
    for (k <- Seq("metric", "value", "unit", "stat", "n_queries", "failed",
        "sf", "detail", "calibration_sec"))
      assert(node.has(k), s"missing $k in $line")
    assert(node.get("n_queries").asInt === 118)
    assert(node.get("failed").isArray)
  }

  test("compact and full lines parse with a failed query (null timing)") {
    val qsWithNull = qs.dropRight(1) + ",\"q_broken\":null}"
    val compact = Bench.compactLine("null", "min_of_3x2", qsWithNull, recall,
      "[\"q_broken\"]", "/sf", "out.json", "1.2345")
    val full = Bench.fullLine("null", "min_of_3x2", qsWithNull, qsWithNull,
      qsWithNull, qsWithNull, qsWithNull, qsWithNull, qsWithNull, qsWithNull,
      recall, "[\"q_broken\"]", "/sf", "1.2345")
    for (line <- Seq(compact, full)) {
      val node = om.readTree(line)
      assert(node.get("value").isNull, "partial totals must be null")
      assert(node.get("calibration_sec").asDouble === 1.2345)
      assert(node.get("failed").get(0).asText === "q_broken")
      assert(node.get("queries").get("q_broken").isNull)
    }
  }

  test("env object: full and compact lines carry the host fingerprint and " +
      "BOTH calibration samples (r16 verdict item 6 — a 3.7x calibration " +
      "swing between same-code runs must be visible in the artifact, not " +
      "discovered by adjudication reruns)") {
    val env = """{"cpu_model":"Test(R) CPU","cpus":32,""" +
      """"load_avg_start":0.06,"load_avg_end":1.5,""" +
      """"calibration_pre":1.09,"calibration_post":4.07}"""
    val full = Bench.fullLine("69.1", "min_of_3x2", qs, qs, qs, qs, qs, qs,
      qs, qs, recall, "[]", "/sf", "1.09", env)
    val compact = Bench.compactLine("69.1", "min_of_3x2", qs, recall, "[]",
      "/sf", "out.json", "1.09", env)
    for (line <- Seq(full, compact)) {
      val e = om.readTree(line).get("env")
      for (k <- Seq("cpu_model", "cpus", "load_avg_start", "load_avg_end",
          "calibration_pre", "calibration_post"))
        assert(e.has(k), s"missing env.$k in $line")
      // the consumer rule the fields exist for: pre/post disagreeing by
      // >2x flags the run as non-normalizable
      assert(e.get("calibration_post").asDouble /
        e.get("calibration_pre").asDouble > 2.0)
    }
  }

  test("loaded-host warning: fires above the quantified cpus/8 limit, " +
      "silent below it, silent on unmeasurable (negative) samples — and " +
      "the artifact writes null, never -1, for those (r17 ADVICE x2)") {
    // the r17 driver run this rule exists for: 8.59 on 32 cpus (limit 4.0)
    assert(Bench.loadLimit(32) === 4.0)
    val warn = Bench.loadWarning(8.59, 32)
    assert(warn.isDefined, "8.59 on 32 cpus must warn")
    assert(warn.get.contains("WARNING") && warn.get.contains("8.59") &&
      warn.get.contains("NOT") && warn.get.contains("quiet window"),
      s"warning line must be unmissable and actionable: ${warn.get}")
    // quiet captures observed on this host: 0.3-1.3 on 32 cpus
    assert(Bench.loadWarning(1.3, 32).isEmpty)
    assert(Bench.loadWarning(4.0, 32).isEmpty, "limit itself is inclusive-ok")
    assert(Bench.loadWarning(4.01, 32).isDefined)
    // platform-can't-measure sentinel never warns and serializes as null
    assert(Bench.loadWarning(-1.0, 32).isEmpty)
    assert(Bench.loadJson(-1.0) === "null")
    assert(Bench.loadJson(0.49) === "0.49")
  }

  test("the committed sf0.1 artifact parses and agrees with its own totals") {
    val p = java.nio.file.Paths.get("/root/repo/bench_times.json")
    assume(java.nio.file.Files.exists(p))
    val node = om.readTree(java.nio.file.Files.readString(p).trim)
    val q = node.get("queries")
    assert(q.size() >= 110)
    val it = q.fields()
    var sum = 0.0
    while (it.hasNext) { val e = it.next(); if (!e.getValue.isNull) sum += e.getValue.asDouble }
    assert(math.abs(sum - node.get("value").asDouble) < 1e-6,
      "total must be the sum of per-query minima")
  }

  test("queries_part chunk lines (r20): each line is standalone JSON " +
      "under the size cap, keys are globally sorted (stable tail subset " +
      "across rounds), parts reassemble to the full per-query map, and " +
      "failed queries ride as null") {
    val entries = (1 to 178).map(i =>
      f"q_example_$i%03d" -> (if (i % 50 == 0) None else Some(i * 0.01231)))
    val lines = Bench.queriesPartLines(entries, "min_of_3x2",
      "/root/testdata/sf0.1")
    assert(lines.size >= 2, "178 queries cannot fit one 1.6 KB chunk")
    val seen = scala.collection.mutable.LinkedHashMap[String, Option[Double]]()
    lines.zipWithIndex.foreach { case (l, i) =>
      assert(l.length <= 1700, s"chunk must survive a bounded tail: ${l.length}")
      val node = om.readTree(l) // parses standalone
      assert(node.get("metric").asText === "queries_part")
      assert(node.get("part").asInt === i + 1)
      assert(node.get("n_parts").asInt === lines.size)
      assert(node.get("stat").asText === "min_of_3x2")
      val it = node.get("queries").fields()
      while (it.hasNext) {
        val e = it.next()
        seen += e.getKey -> (if (e.getValue.isNull) None
          else Some(e.getValue.asDouble))
      }
    }
    assert(seen.keys.toSeq === seen.keys.toSeq.sorted,
      "concatenated parts must be globally key-sorted")
    assert(seen.size === 178)
    entries.foreach { case (k, v) =>
      assert(seen(k).isDefined === v.isDefined)
      v.foreach(x => assert(math.abs(seen(k).get - x) < 1e-4))
    }
    // empty input → no chunk lines (subset-filtered runs stay quiet)
    assert(Bench.queriesPartLines(Seq.empty, "min_of_3x2", "/sf").isEmpty)
  }
}
