package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines ingest/egress (SURVEY.md §2.1 sources/sinks, interchange
  * edition): JSONL is the lingua franca of LLM training corpora — every
  * public dataset release (C4, The Pile, Dolma, FineWeb) ships as
  * newline-delimited JSON, so a pipeline engine needs a lossless
  * parquet ↔ jsonl boundary. Spark's `json` format IS JSONL (one object
  * per line, one file per partition), so both directions stay fully
  * distributed — unlike the Arrow IPC boundary there is no driver
  * materialization.
  *
  * Write-side notes for corpus egress:
  *   - an explicit read schema is REQUIRED on ingest: schema inference
  *     scans the data twice and types by example (a column of all-null
  *     becomes string) — at 100 TB that is both a correctness and a cost
  *     bug, so [[readJsonl]] refuses to infer;
  *   - writers emit one file per partition — callers control shard count
  *     and order with [[graft.operators.Pack.shardDocs]] + repartition,
  *     not by coalescing here.
  */
object TextFormats {

  /** DataFrame → JSONL directory (one `part-*.json` per partition). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL directory → DataFrame with a caller-supplied schema (no
    * inference pass — see class doc). Corruption is loud by default
    * (FAILFAST: one malformed line aborts the read); pass PERMISSIVE to
    * tolerate bad lines as all-null rows instead — the right mode for
    * scraped corpora where a few broken records must not kill a 100 TB
    * ingest, wrong for interchange of data you produced yourself. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      mode: String = "FAILFAST"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)
}
