package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.execution.arrow.ArrowConverters
import scala.jdk.CollectionConverters._

/** Arrow IPC interop, reaching into `private[sql]`
  * [[org.apache.spark.sql.execution.arrow.ArrowConverters]] (the machinery
  * behind PySpark's `toArrow`/`createDataFrame(arrow)`), the same way
  * [[Bridge]] reaches ExpressionUtils. Public surface lives in
  * `graft.sources.ArrowInterop`.
  */
object ArrowBridge {

  /** DataFrame → one self-contained Arrow IPC stream (schema + one record
    * batch). Driver-side materialization by design — this is the egress
    * boundary (`__arrow_array__` analogue), not a distributed operator. */
  def toIPCStream(df: DataFrame): Array[Byte] = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val schema = cdf.schema
    val tz = cdf.sparkSession.sessionState.conf.sessionLocalTimeZone
    val rows = cdf.queryExecution.executedPlan.executeCollect().iterator
    val batches = ArrowConverters.toBatchWithSchemaIterator(
      rows, schema, Long.MaxValue, Long.MaxValue, tz,
      true, false).toArray
    if (batches.isEmpty)
      ArrowConverters.createEmptyArrowBatch(schema, tz, true, false)
    else batches.head
  }

  /** Arrow IPC stream bytes → DataFrame (ingest boundary,
    * `pandas_from_arrow` analogue). The stream's own schema is used. */
  def fromIPCStream(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val (iter, schema) = ArrowConverters.fromIPCStream(bytes)
    try {
      val conv = CatalystTypeConverters.createToScalaConverter(schema)
      val rows = iter.map(r => conv(r).asInstanceOf[Row]).toList
      spark.createDataFrame(rows.asJava, schema)
    } finally iter.close()
  }
}
