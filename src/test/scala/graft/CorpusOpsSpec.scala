package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pack, Quality}

/** Corpus-preparation operators: sharding, packing, segment dedup, rank
  * scoring, JSONL boundary. The oracle gates (q_pipe_shard/_pack/_seg_dedup/
  * _word_rank, q_jsonl_roundtrip) pin cross-engine agreement; this pins the
  * operators' structural invariants — the properties a training job relies
  * on (dense sequences, exact pack sizes, token-partition completeness).
  */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("shardDocs: shards in range, seq dense from 0 per shard, " +
      "layout-invariant") {
    val out = Pack.shardDocs(docs.select($"doc_id"), "doc_id", 8, 7L)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.length === docs.count())
    assert(rows.forall { case (_, sh, _) => sh >= 0 && sh < 8 })
    // dense 0..n−1 within each shard
    for ((_, g) <- rows.groupBy(_._2))
      assert(g.map(_._3).sorted.toSeq === (0 until g.length))
    // pure function of (id, seed): partitioning must not matter
    val again = Pack.shardDocs(docs.select($"doc_id").repartition(13),
      "doc_id", 8, 7L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // a different seed produces a different permutation (epochs decorrelate)
    val other = Pack.shardDocs(docs.select($"doc_id"), "doc_id", 8, 8L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(other.sortBy(_._1).toSeq !== rows.sortBy(_._1).toSeq)
  }

  test("packTokens: pieces exactly partition every document's tokens and " +
      "every non-final pack holds exactly seqLen tokens") {
    val L = 256
    val in = docs.select($"doc_id",
      size(split($"text", " ")).cast("long").as("n_tok"))
    val out = Pack.packTokens(in, "doc_id", "n_tok", 4, 3L, L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // (doc_id, n_tok, shard, seq, pack, doc_from, doc_to, pack_from)
    for ((doc, pieces) <- out.groupBy(_._1)) {
      val n = pieces.head._2
      val ordered = pieces.sortBy(_._5)
      // contiguous cover of [0, n): first starts at 0, last ends at n,
      // each piece starts where the previous ended, packs consecutive
      assert(ordered.head._6 === 0L, s"doc $doc")
      assert(ordered.last._7 === n, s"doc $doc")
      for (Array(a, b) <- ordered.sliding(2) if ordered.length > 1) {
        assert(b._6 === a._7, s"doc $doc gap")
        assert(b._5 === a._5 + 1, s"doc $doc pack skip")
        assert(b._8 === 0L, s"doc $doc continuation must start its pack")
      }
    }
    // per (shard, pack): piece lengths tile the pack exactly — seqLen
    // tokens for every pack but the shard's last (which may be short)
    for (((sh, pk), pieces) <- out.groupBy(p => (p._3, p._5))) {
      val tokens = pieces.map(p => p._7 - p._6).sum
      val lastPack = out.filter(_._3 == sh).map(_._5).max
      if (pk < lastPack) assert(tokens === L, s"shard $sh pack $pk")
      else assert(tokens > 0 && tokens <= L, s"shard $sh final pack")
      // offsets within the pack tile it: sorted pack_from values chain
      val byOff = pieces.sortBy(_._8)
      assert(byOff.head._8 === 0L)
      for (Array(a, b) <- byOff.sliding(2) if byOff.length > 1)
        assert(b._8 === a._8 + (a._7 - a._6), s"shard $sh pack $pk tiling")
    }
  }

  test("packTokens invariants hold across randomized shapes (seeded sweep)") {
    // deterministic pseudo-random corpora: ids with gaps/negatives are NOT
    // exercised (domain is non-negative ids per scaladoc); token counts
    // include 0 and > seqLen
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val nShards = 1 + rnd.nextInt(5)
      val l = 1 + rnd.nextInt(40)
      val seed = rnd.nextLong()
      val rows = (0 until 100 + rnd.nextInt(200))
        .map(i => (i.toLong, rnd.nextInt(3 * l).toLong))
      val in = rows.toDF("id", "n")
      val out = Pack.packTokens(in, "id", "n", nShards, seed, l).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      val ctx = s"trial $trial (shards=$nShards L=$l)"
      // total piece tokens == total input tokens (each token placed once)
      assert(out.map(p => p._7 - p._6).sum === rows.map(_._2).sum, ctx)
      // every non-final pack of every shard holds exactly L tokens
      for (((sh, pk), pieces) <- out.groupBy(p => (p._3, p._5))) {
        val tok = pieces.map(p => p._7 - p._6).sum
        if (pk < out.filter(_._3 == sh).map(_._5).max)
          assert(tok === l, s"$ctx shard $sh pack $pk")
        else assert(tok > 0 && tok <= l, s"$ctx shard $sh final")
      }
      // per-doc pieces tile [0, n) contiguously over consecutive packs
      for ((id, pieces) <- out.groupBy(_._1)) {
        val o = pieces.sortBy(_._5)
        assert(o.head._6 === 0L, s"$ctx doc $id")
        assert(o.last._7 === o.head._2, s"$ctx doc $id")
        for (Array(a, b) <- o.sliding(2) if o.length > 1)
          assert(b._6 === a._7 && b._5 === a._5 + 1, s"$ctx doc $id")
      }
    }
  }

  test("packTokens drops zero-token docs but keeps offsets contiguous") {
    val in = Seq((1L, 3L), (2L, 0L), (3L, 5L)).toDF("id", "n")
    val out = Pack.packTokens(in, "id", "n", 1, 0L, 4).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(!out.exists(_._1 == 2L))
    assert(out.map(p => p._4 - p._3).sum === 8L) // all 8 tokens placed once
  }

  test("dedupSegments: first occurrence wins corpus-wide AND within a " +
      "document; reassembly preserves order; fully-duped doc becomes ''") {
    val a = "a1 a2 a3 a4 b1 b2 b3 b4"          // segs A, B
    val b = "b1 b2 b3 b4 c1 c2 c3 c4"          // B duped from doc 1
    val c = "d1 d2 d3 d4 d1 d2 d3 d4"          // D duped within the doc
    val d = "a1 a2 a3 a4 b1 b2 b3 b4"          // everything seen before
    val in = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(in, "text", "doc_id", 4).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === (("a1 a2 a3 a4 b1 b2 b3 b4", 2L, 2L)))
    assert(out(2L) === (("c1 c2 c3 c4", 2L, 1L)))
    assert(out(3L) === (("d1 d2 d3 d4", 2L, 1L)))
    assert(out(4L) === (("", 2L, 0L)))
  }

  test("dedupSegments keeps a short tail segment and is layout-invariant " +
      "on real data") {
    val in = Seq((1L, "x1 x2 x3 x4 t1 t2")).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(in, "text", "doc_id", 4).collect()
    assert(out.head.getString(1) === "x1 x2 x3 x4 t1 t2")
    val base = Dedup.dedupSegments(docs, "text", "doc_id", 8)
      .orderBy($"doc_id").collect().toSeq
    val re = Dedup.dedupSegments(docs.repartition(13), "text", "doc_id", 8)
      .orderBy($"doc_id").collect().toSeq
    assert(base === re)
  }

  test("corpusRankScore: rank 1 = most frequent token, ties by text; " +
      "score is the exact rank sum") {
    // freq: z:3, b:2, a:2, q:1 → ranks: z=1, a=2, b=3 (tie 2 vs 2 by text),
    // q=4
    val in = Seq((1L, "z z b a"), (2L, "z b a q")).toDF("doc_id", "text")
    val out = Quality.corpusRankScore(in, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((4L, 1L + 1L + 3L + 2L)))
    assert(out(2L) === ((4L, 1L + 3L + 2L + 4L)))
  }

  test("compressionSignal: boilerplate < prose < gibberish ordering, " +
      "sane bounds, deterministic under partitioning") {
    val boiler = ("lorem ipsum " * 40).trim            // highly repetitive
    val prose = "the quick brown fox jumps over the lazy dog while a " +
      "cunning red vixen watches from dense undergrowth nearby planning " +
      "her own approach to the henhouse under cover of evening fog"
    val noise = (1 to 80).map(i => ((i * 2654435761L) % 93 + 33).toChar)
      .mkString                                        // pseudo-random ascii
    val in = Seq((1L, boiler), (2L, prose), (3L, noise))
      .toDF("doc_id", "text")
    // empty text: no bytes, no signal — ratio must be null, not +Infinity
    val empty = Quality.compressionSignal(
      Seq((9L, "")).toDF("doc_id", "text"), "text", "doc_id").head()
    assert(empty.getInt(1) === 0 && empty.isNullAt(3))
    val out = Quality.compressionSignal(in, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
    for ((id, (raw, defl, ratio)) <- out) {
      assert(raw > 0 && defl > 0, s"doc $id")
      assert(ratio > 0.0 && ratio < 1.5, s"doc $id ratio $ratio")
    }
    assert(out(1L)._3 < out(2L)._3, "boilerplate must beat prose")
    assert(out(2L)._3 < out(3L)._3, "prose must beat gibberish")
    // pure function of the text: layout cannot change it
    val a = Quality.compressionSignal(docs, "text", "doc_id")
      .orderBy($"doc_id").collect().toSeq
    val b = Quality.compressionSignal(docs.repartition(13), "text", "doc_id")
      .orderBy($"doc_id").collect().toSeq
    assert(a === b)
  }

  test("packText: concatenating a pack's pieces in pack_from order yields " +
      "exactly seqLen tokens, and concatenating a doc's pieces in pack " +
      "order restores the document") {
    val l = 64
    val out = Pack.packText(docs, "text", "doc_id", 4, 3L, l).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc reassembly: pieces in pack order, space-joined == original text
    for ((id, pieces) <- out.groupBy(_._1)) {
      val joined = pieces.sortBy(_._3).map(_._5).mkString(" ")
      assert(joined === texts(id), s"doc $id")
    }
    // pack reassembly: pieces in pack_from order give exactly l tokens for
    // every non-final pack of each shard
    for (((sh, pk), pieces) <- out.groupBy(p => (p._2, p._3))) {
      val lastPack = out.filter(_._2 == sh).map(_._3).max
      val n = pieces.sortBy(_._4).map(_._5.split(" ").length).sum
      if (pk < lastPack) assert(n === l, s"shard $sh pack $pk")
      else assert(n > 0 && n <= l, s"shard $sh final pack")
    }
  }

  test("jsonl roundtrip is the identity on the documents table") {
    val path = "/root/repo/target/scratch/jsonl_spec"
    graft.sources.TextFormats.writeJsonl(docs, path)
    val back = graft.sources.TextFormats.readJsonl(spark, path, docs.schema)
    assert(back.schema === docs.schema)
    assert(back.orderBy($"doc_id").collect().toSeq ===
      docs.orderBy($"doc_id").collect().toSeq)
  }
}
