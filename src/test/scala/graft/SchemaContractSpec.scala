package graft

import graft.queries.tbl

/** The dtype contract between the data layer and every operator: reads every
  * driver table through the canonical read boundary (`queries.tbl` →
  * `canonicalizeTime`) and pins the POST-read schema. The r11→r12 testdata
  * regeneration silently flipped `events.ts` from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS) and broke 13 gates with `ClassCastException`s thirty
  * queries downstream — this suite exists so the next unit change fails HERE,
  * with a message naming the offending table, column, and arrived type.
  *
  * The contract is on the canonicalized schema, not the raw parquet: the
  * read boundary is explicitly allowed to absorb any timestamp unit
  * (BIGINT-nanos / TIMESTAMP / TIMESTAMP_NTZ — the same latitude the
  * reference gives Arrow ingest, reference fletcher/base.py:94-105), so a
  * regeneration only fails this suite if it produces something the boundary
  * cannot normalize (e.g. a string ts, a renamed column, a dropped table).
  */
class SchemaContractSpec extends SparkTestBase {

  private val contract: Map[String, Map[String, String]] = Map(
    "region" -> Map("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Map("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Map("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Map("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Map("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Map("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Map("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Map("event_id" -> "bigint", "ts" -> "bigint",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Map("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Map("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(s => s"/root/testdata/$s")
    .filter(d => new java.io.File(d).exists())

  test("every sf directory is present to check") {
    assert(sfDirs.nonEmpty, "no testdata directories found")
  }

  for (dir <- sfDirs; (table, cols) <- contract.toSeq.sortBy(_._1)) {
    test(s"$dir/$table canonicalized schema matches the dtype contract") {
      val schema = tbl(spark, dir, table).schema
      val got = schema.fields.map(f => f.name -> f.dataType.sql.toLowerCase)
        .toMap
      val missing = cols.keySet -- got.keySet
      assert(missing.isEmpty,
        s"table=$table: contract columns absent from parquet: " +
          missing.toSeq.sorted.mkString(", "))
      for ((name, want) <- cols.toSeq.sortBy(_._1)) {
        assert(got(name) == want,
          s"table=$table column=$name: canonicalized dtype '${got(name)}' " +
            s"!= contract '$want' — the data layer changed a physical " +
            "type the read boundary (queries.canonicalizeTime) does not " +
            "absorb; extend the boundary, do not patch consumers")
      }
      val extra = got.keySet -- cols.keySet
      assert(extra.isEmpty,
        s"table=$table: columns beyond the contract (update " +
          s"SchemaContractSpec if intentional): " +
          extra.toSeq.sorted.mkString(", "))
    }
  }

  test("events.ts canonicalizes identically from all three arrival units") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nanos = Seq(1700000000123456789L, 1700003600000000000L)
    val base = nanos.toDF("ts")
    // micros-timestamp arrivals truncate sub-µs nanos exactly like the
    // parquet writer would; compare against the truncated canonical value
    val wantUs = nanos.map(_ / 1000 * 1000)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      graft.queries.canonicalizeTime(df)
        .select($"ts").as[Long].collect().toSeq.sorted
    val fromLong = canon(base)
    val fromTs = canon(base.select(
      timestamp_micros(expr("ts div 1000")).as("ts")))
    val fromNtz = canon(base.select(timestamp_micros(expr("ts div 1000"))
      .cast(org.apache.spark.sql.types.TimestampNTZType).as("ts")))
    assert(fromLong == nanos.sorted)
    assert(fromTs == wantUs.sorted,
      s"TIMESTAMP arrival canonicalized to $fromTs, want $wantUs")
    assert(fromNtz == wantUs.sorted,
      s"TIMESTAMP_NTZ arrival canonicalized to $fromNtz, want $wantUs")
  }
}
