package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Ingest/egress boundary ops (SURVEY.md §2.1): Arrow IPC in/out and
  * in-memory sequence ingest — the Spark-native spellings of the
  * reference's `pandas_from_arrow` (io.py), `__arrow_array__`
  * (base.py:1712-1750) and `_from_sequence`.
  *
  * These are BOUNDARY operators: egress materializes on the driver by
  * contract (exactly like the reference handing an Arrow array to pandas);
  * inside the engine data stays distributed — don't round-trip through
  * these mid-pipeline.
  */
object ArrowInterop {

  /** Arrow IPC stream bytes → DataFrame (schema read from the stream). */
  def fromArrow(spark: SparkSession, ipcStream: Array[Byte]): DataFrame =
    org.apache.spark.sql.graft.ArrowBridge.fromIPCStream(spark, ipcStream)

  /** DataFrame → self-contained Arrow IPC stream (schema + data).
    * Driver-side materialization — egress boundary only. */
  def toArrow(df: DataFrame): Array[Byte] =
    org.apache.spark.sql.graft.ArrowBridge.toIPCStream(df)

  /** In-memory sequence → Dataset (`_from_sequence` analogue). */
  def fromSequence[T: Encoder](spark: SparkSession, data: Seq[T]): Dataset[T] =
    spark.createDataset(data)

  /** Local collect (`to_numpy`/`__array__` analogue) — explicit by-name
    * egress, pairs with [[fromSequence]]. */
  def toLocalSeq[T](ds: Dataset[T]): Seq[T] = ds.collect().toSeq
}
