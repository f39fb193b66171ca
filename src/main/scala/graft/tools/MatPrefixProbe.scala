// Run with: sbt "runMain graft.tools.MatPrefixProbe"
package graft.tools

/** r17 verdict item 5: sweep the matryoshka PREFIX WIDTH (the last
  * unswept knob after the r17 floor sweep showed the shortlist floor
  * inert at scale). Arms: the pre-r18 baseline (MatPrefixDimPrior = 32),
  * the shipped point (MatPrefixDim), and an above-the-knee 48 — derived
  * from the named constants plus one pinned super-knee arm, so a retune
  * keeps the sweep able to reproduce the committed decision artifact
  * (the r18 32→40 retune briefly collapsed a hardcoded first arm onto
  * the shipped one, losing the baseline — review finding).
  *
  * The decision metric is recall per SCANNED BYTE: the matryoshka scan
  * reads prefixDim of Dim doubles per corpus row (the whole point of the
  * operator is paying a fraction of the scan), so each arm's scan cost is
  * prefixDim/64 of brute. The shortlist (max(16k, 2⌈√n⌉) exact re-rank
  * rows) is identical across arms — only the prefix fraction moves.
  * MatryoshkaLayoutSpec pins the byte arithmetic this probe's scan_frac
  * column uses. r18 decision (MAT_PREFIX_PROBE.json): 40 peaks at sf0.1
  * (1.392) and ties the peak at sf1 (1.384 vs 32's 1.390), recall
  * 0.685/0.695 → 0.870/0.865 — shipped.
  */
object MatPrefixProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = "/root/repo/target/sf1"
    val sf01 = "/root/testdata/sf0.1"
    val spark = ProbeUtil.session()

    val k = graft.queries.Similarity.K
    val panel = graft.queries.Similarity.RecallPanel
    val dims = Seq(graft.queries.Similarity.MatPrefixDimPrior,
      graft.queries.Similarity.MatPrefixDim, 48).distinct.sorted

    val rows = for (dir <- Seq(sf01, sf1)) yield {
      val emb = graft.queries.tbl(spark, dir, "embeddings")
      val n = emb.count()
      val shortlist = graft.queries.Similarity.matShortlistFor(n)
      val brute = ProbeUtil.topSets(graft.operators.Similarity.knnBrute(
        emb, "embedding", "vec_id", panel, k))
      val arms = dims.map { pd =>
        val ann = ProbeUtil.topSets(graft.operators.Similarity.knnTruncated(
          emb, "embedding", "vec_id", panel, k, pd, shortlist))
        val recall = ProbeUtil.recallOf(brute, ann)
        val scanFrac = pd / 64.0
        println(f"[mat-prefix] ${new java.io.File(dir).getName}%-6s n=$n " +
          f"prefix=$pd shortlist=$shortlist recall=$recall%.3f " +
          f"scan_frac=$scanFrac%.3f recall/frac=${recall / scanFrac}%.3f")
        (pd, recall, scanFrac)
      }
      (new java.io.File(dir).getName, n, shortlist, arms)
    }
    // r18 verdict item 7: half/double the SHORTLIST at the shipped 40-dim
    // point — the operating shortlist schedule was tuned in the 32-dim
    // era, so the knee's second dimension is inherited, not re-measured.
    // Decision metric here includes the shortlist's own read cost (the
    // exact re-rank fetches full 64-dim rows): frac = prefixDim/64 +
    // shortlist/n, so a doubled shortlist must buy its recall with bytes,
    // same currency as a widened prefix.
    val pdShip = graft.queries.Similarity.MatPrefixDim
    val slRows = for (dir <- Seq(sf01, sf1)) yield {
      val emb = graft.queries.tbl(spark, dir, "embeddings")
      val n = emb.count()
      val base = graft.queries.Similarity.matShortlistFor(n)
      val brute = ProbeUtil.topSets(graft.operators.Similarity.knnBrute(
        emb, "embedding", "vec_id", panel, k))
      val arms = Seq(base / 2, base, base * 2).distinct.map { sl =>
        val ann = ProbeUtil.topSets(graft.operators.Similarity.knnTruncated(
          emb, "embedding", "vec_id", panel, k, pdShip, sl))
        val recall = ProbeUtil.recallOf(brute, ann)
        val frac = pdShip / 64.0 + sl.toDouble / n
        println(f"[mat-shortlist] ${new java.io.File(dir).getName}%-6s " +
          f"n=$n prefix=$pdShip shortlist=$sl recall=$recall%.3f " +
          f"read_frac=$frac%.3f recall/frac=${recall / frac}%.3f")
        (sl, recall, frac)
      }
      (new java.io.File(dir).getName, n, arms)
    }
    val json = (rows.map { case (sf, n, shortlist, arms) =>
      val armJson = arms.map { case (pd, r, f) =>
        f"""{"prefix_dim": $pd, "recall": $r%.3f, "scan_frac": $f%.3f, "recall_per_frac": ${r / f}%.3f}"""
      }.mkString("[", ", ", "]")
      s""""$sf": {"n": $n, "shortlist": $shortlist, "arms": $armJson}"""
    } ++ slRows.map { case (sf, n, arms) =>
      val armJson = arms.map { case (sl, r, f) =>
        f"""{"shortlist": $sl, "recall": $r%.3f, "read_frac": $f%.3f, "recall_per_frac": ${r / f}%.3f}"""
      }.mkString("[", ", ", "]")
      s""""shortlist_sweep_at_${pdShip}_$sf": {"n": $n, "arms": $armJson, "note": "read_frac folds the re-rank fetch in (prefixDim/64 + shortlist/n) so both knob dimensions spend the same byte currency"}"""
    }).mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/MAT_PREFIX_PROBE.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
