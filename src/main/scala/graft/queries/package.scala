package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One driver-checkable query: the Spark plan plus (optionally) the
    * equivalent DuckDB SQL oracle. Queries without an oracle get the driver's
    * weaker rows-only check. Every oracle-bearing query MUST produce identical
    * column names and deterministic row order on both sides.
    */
  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String] = None)

  /** Read one of the driver-generated tables under the given sf directory. */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
