package graft

import org.apache.spark.sql.functions._
import graft.operators.{Fuzzy, Resample}

/** Fuzzy edit-distance join (deletion-neighborhood blocking) and
  * time-series resample/ffill semantics. */
class FuzzyResampleSpec extends SparkTestBase {

  import spark.implicits._

  test("edSelfJoin finds every ED<=1 pair class and rejects ED=2") {
    // equal / substitution / deletion / insertion / transposition (=2) /
    // unrelated — one representative per deletion-neighborhood case.
    val df = Seq(
      (1L, "kitten"), (2L, "kitten"), // equal
      (3L, "sitten"),                 // substitution vs 1
      (4L, "kiten"),                  // deletion vs 1
      (5L, "kittens"),                // insertion vs 1
      (6L, "ikttne"),                 // scrambled, far
      (7L, "itkten")                  // transposition vs 1: ED=2, must NOT match
    ).toDF("id", "s")
    val got = Fuzzy.edSelfJoin(df, "id", "s")
      .select($"id1", $"id2", $"ed").as[(Long, Long, Int)]
      .collect().toSet
    val brute = df.as("a").crossJoin(df.as("b"))
      .where($"a.id" < $"b.id" && levenshtein($"a.s", $"b.s") <= 1)
      .select($"a.id", $"b.id", levenshtein($"a.s", $"b.s"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
    // One representative per neighborhood case is really in there:
    assert(Set((1L, 2L, 0), (1L, 3L, 1), (1L, 4L, 1), (1L, 5L, 1))
      .subsetOf(got))
    // ED-2 transposition must be excluded by the verify:
    assert(!got.exists { case (a, b, _) => (a, b) == (1L, 7L) })
  }

  test("edSelfJoin plan has no cartesian/BNLJ") {
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "s")
    val plan = Fuzzy.edSelfJoin(df, "id", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("edSelfJoin on supplier matches brute force at sf0.001") {
    val sup = queries.tbl(spark, sf0001, "supplier")
      .select($"s_suppkey", $"s_name")
    val got = Fuzzy.edSelfJoin(sup, "s_suppkey", "s_name")
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val brute = sup.as("a").crossJoin(sup.as("b"))
      .where($"a.s_suppkey" < $"b.s_suppkey" &&
        levenshtein($"a.s_name", $"b.s_name") <= 1)
      .select($"a.s_suppkey", $"b.s_suppkey").as[(Long, Long)].collect().toSet
    assert(got === brute)
    assert(brute.nonEmpty)
  }

  test("resample densifies gaps, zero-counts them, and forward-fills") {
    val h = 3600L * 1000 * 1000 * 1000
    // user 1: buckets 0 and 3 occupied (gap at 1, 2); user 2: single bucket.
    val df = Seq(
      (1L, 0L * h + 5L, 10.0), (1L, 0L * h + 6L, 20.0),
      (1L, 3L * h + 1L, 7.0),
      (2L, 2L * h + 9L, 1.0)
    ).toDF("user_id", "ts", "value")
    val got = Resample.resample(df, "user_id", "ts", h, "value")
      .orderBy($"user_id", $"bucket_ns")
      .select($"user_id", $"bucket_ns", $"n_events", $"v_mean", $"v_ffill")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      (1L, 0L, 2L, Some(15.0), Some(15.0)),
      (1L, h, 0L, None, Some(15.0)),
      (1L, 2 * h, 0L, None, Some(15.0)),
      (1L, 3 * h, 1L, Some(7.0), Some(7.0)),
      (2L, 2 * h, 1L, Some(1.0), Some(1.0))))
  }

  test("resampleInterp linearly fills interior gaps, keeps occupied means") {
    val h = 3600L * 1000 * 1000 * 1000
    val df = Seq(
      (1L, 0L * h + 1L, 10.0), (1L, 3L * h + 1L, 40.0), // gap at 1, 2
      (2L, 5L * h + 2L, 9.0)
    ).toDF("user_id", "ts", "value")
    val got = graft.operators.Resample
      .resampleInterp(df, "user_id", "ts", h, "value")
      .orderBy($"user_id", $"bucket_ns")
      .select($"user_id", $"bucket_ns", $"v_interp")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 10.0), (1L, h, 20.0), (1L, 2 * h, 30.0), (1L, 3 * h, 40.0),
      (2L, 5 * h, 9.0)))
  }

  test("rolling 1h frame is (t-1h, t]: exactly-1h-old rows fall out") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val G = 1000L * 1000 * 1000
    val df = Seq(
      (1L, 0L, 1.0), (2L, 1800L * G, 2.0), (3L, 3600L * G, 4.0),
      (4L, 9000L * G, 8.0)
    ).toDF("event_id", "ts", "value").withColumn("user_id", lit(7L))
    val w = Window.partitionBy($"user_id").orderBy($"ts")
      .rangeBetween(-(3600L * G - 1), 0L)
    val got = df.select($"event_id",
        count(lit(1)).over(w).as("n"),
        sum($"value".cast(DecimalType(38, 6))).over(w).cast("double").as("s"))
      .orderBy($"event_id").as[(Long, Long, Double)].collect().toSeq
    // at t=3600s the t=0 row is exactly 1h old -> excluded (pandas
    // rolling("1h") closed-right semantics)
    assert(got === Seq((1L, 1L, 1.0), (2L, 2L, 3.0), (3L, 2L, 6.0),
      (4L, 1L, 8.0)))
  }

  test("edSelfJoin equals brute force on seeded random dense strings") {
    // short strings over a 3-letter alphabet maximize ED<=1 structure:
    // every class of neighborhood overlap (and near-miss) occurs.
    val rnd = new scala.util.Random(42)
    val rows = (1L to 60L).map { id =>
      val len = 3 + rnd.nextInt(5)
      (id, Seq.fill(len)("abc" (rnd.nextInt(3))).mkString)
    }
    val df = rows.toDF("id", "s")
    val got = Fuzzy.edSelfJoin(df, "id", "s")
      .select($"id1", $"id2", $"ed").as[(Long, Long, Int)].collect().toSet
    val brute = df.as("a").crossJoin(df.as("b"))
      .where($"a.id" < $"b.id" && levenshtein($"a.s", $"b.s") <= 1)
      .select($"a.id", $"b.id", levenshtein($"a.s", $"b.s"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
    assert(brute.nonEmpty) // seed produces real matches, not a vacuous pass
  }

  test("resample equals a driver-computed reference on seeded random events") {
    val rnd = new scala.util.Random(7)
    val step = 500L
    val rows = for (_ <- 1 to 300) yield
      (rnd.nextInt(5).toLong, rnd.nextInt(5000).toLong,
        (rnd.nextInt(100) + 1).toDouble)
    val df = rows.toDF("user_id", "ts", "value")
    val got = graft.operators.Resample
      .resample(df, "user_id", "ts", step, "value")
      .select($"user_id", $"bucket_ns", $"n_events", $"v_ffill")
      .as[(Long, Long, Long, Double)].collect().toSet
    val ref = rows.groupBy(_._1).flatMap { case (u, evs) =>
      val byBucket = evs.groupBy(e => e._2 - e._2 % step)
      val lo = byBucket.keys.min; val hi = byBucket.keys.max
      var fill = 0.0
      (lo to hi by step).map { b =>
        val bucket = byBucket.getOrElse(b, Seq.empty)
        if (bucket.nonEmpty)
          fill = bucket.map(e => BigDecimal(e._3)).sum.toDouble / bucket.size
        (u, b, bucket.size.toLong, fill)
      }
    }.toSet
    assert(got === ref)
  }

  test("resample grid never extends beyond a key's [min, max] span") {
    val h = 100L
    val df = Seq((1L, 250L, 1.0), (1L, 999L, 2.0)).toDF("user_id", "ts", "value")
    val buckets = Resample.resample(df, "user_id", "ts", h, "value")
      .select($"bucket_ns").as[Long].collect().sorted
    assert(buckets.head === 200L && buckets.last === 900L)
    assert(buckets.length === 8)
  }

  test("sortedNeighborhood is a subset of deletion blocking; equal when " +
      "the window covers everything") {
    val df = Seq(
      (1L, "kitten"), (2L, "kitten"), (3L, "sitten"), (4L, "kiten"),
      (5L, "kittens"), (6L, "zebra"), (7L, "zebr"), (8L, "aardvark")
    ).toDF("id", "s")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select($"id1", $"id2", $"ed").as[(Long, Long, Int)].collect().toSet
    val complete = pairs(Fuzzy.edSelfJoin(df, "id", "s"))
    // SNM with any window only ever finds true ED<=1 pairs
    val narrow = pairs(Fuzzy.sortedNeighborhood(df, "id", "s", w = 2))
    assert(narrow.subsetOf(complete))
    // window >= n-1 compares every pair: SNM becomes complete too
    val wide = pairs(Fuzzy.sortedNeighborhood(df, "id", "s", w = 8))
    assert(wide === complete)
  }

  test("sortedNeighborhood pairs each neighborhood exactly once (no " +
      "double-count across the block boundary) on seeded random strings") {
    val rnd = new scala.util.Random(11)
    val strs = (1L to 120L).map { i =>
      i -> (1 to 4).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val df = strs.toDF("id", "s").repartition(5)
    val w = 6
    val got = Fuzzy.sortedNeighborhood(df, "id", "s", w)
      .select($"id1", $"id2").as[(Long, Long)].collect().toList
    assert(got.size === got.toSet.size, "pair emitted more than once")
    // driver reference: sort, compare each to the next w, verify ED<=1
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val sorted = strs.sortBy { case (id, s) => (s, id) }
    val ref = (for {
      i <- sorted.indices
      j <- (i + 1) to math.min(i + w, sorted.size - 1)
      if ed(sorted(i)._2, sorted(j)._2) <= 1
    } yield {
      val (a, b) = (sorted(i)._1, sorted(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    assert(got.toSet === ref)
  }

  test("sortedNeighborhood plan has no cartesian/BNLJ") {
    val df = Seq((1L, "aa"), (2L, "ab"), (3L, "bb")).toDF("id", "s")
    val plan = Fuzzy.sortedNeighborhood(df, "id", "s", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
