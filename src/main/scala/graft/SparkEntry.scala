package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared done in SURVEY.md §2 has an entry in [[queries]]
  * and (where SQL-expressible) a DuckDB oracle in [[oracleSql]]. Query
  * definitions live in `graft.queries.*`, grouped by surface area.
  */
object SparkEntry {

  /** All query groups, merged. Group files: Relational (§2.1-2.3, 2.5-2.7),
    * Aggregates (§2.4), Scalar (§2.8.1-2.8.2), Strings (§2.8.3-2.8.4),
    * TextPipeline + Similarity (LLM-data-pipeline extensions).
    */
  private def all: Map[String, Q] =
    Relational.defs ++ Aggregates.defs ++ Scalar.defs ++
      Strings.defs ++ TextPipeline.defs ++ Similarity.defs ++
      Streaming.defs ++ Corpus.defs ++ EventAnalytics.defs ++ Analytics.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, Q(_, Some(sql))) => name -> sql }
}
