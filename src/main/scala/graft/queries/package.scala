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

  /** Physical-layout hook applied to every table read. Identity in
    * production; LayoutMatrixSpec swaps in repartition(n) / empty-input to
    * assert every gated query is layout-invariant — the Spark analog of the
    * reference's adversarial chunk-offset/chunking fixtures
    * (reference tests/conftest.py:141-144, tests/test_algorithms.py:58-66).
    *
    * SAFETY: this is a JVM-global mutable hook. It is only sound because the
    * test JVM runs suites sequentially (build.sbt pins
    * `Test / parallelExecution := false`); parallel forked tests would leak
    * adversarial layouts into unrelated suites nondeterministically.
    */
  @volatile private[graft] var tableLayout: DataFrame => DataFrame = identity

  /** Read one of the driver-generated tables under the given sf directory. */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    tableLayout(spark.read.parquet(s"$dir/$name.parquet"))
}
