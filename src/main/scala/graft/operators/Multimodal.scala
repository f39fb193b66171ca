package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata; decode/feature kernels run per-partition in bounded batches.
  *
  * Scale design: blobs NEVER shuffle — every op here is a narrow map over
  * the partition that read the bytes. Metadata/digest ops are codegen'd
  * built-in expressions; the decode stages are `mapPartitions` over a typed
  * Dataset with an explicit batch size (the JVM spelling of the
  * mapInPandas/Arrow-batch shape: bounded memory per batch regardless of
  * blob count per partition).
  *
  * DECODE IS STUBBED: this container has no image/audio codecs, so
  * [[FakeCodec]] derives deterministic pseudo-features from the bytes. The
  * schema, partitioning, batching and operator signatures are the real,
  * tested surface; swap [[FakeCodec]] for a JNI/javacpp codec to go live.
  */
object Multimodal {

  /** One media blob: id + modality + raw bytes + source metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, n_frames: Int)

  /** Decoded features: fixed-dim embedding + decoded dims. */
  case class MediaFeatures(media_id: Long, kind: String, out_width: Int,
      out_height: Int, embedding: Array[Float])

  /** One sampled video frame (byte-range into the blob, not a copy). */
  case class FrameRef(media_id: Long, frame_idx: Int, byte_start: Long,
      byte_len: Long)

  // ---- metadata / digest surface: pure codegen'd expressions ----

  /** Container-format sniff from magic bytes (JPEG/PNG/GIF/RIFF/MP4/...). */
  def sniffFormat(bytes: Column): Column = {
    val m4 = hex(substring(bytes, 1, 4))
    val m8 = hex(substring(bytes, 5, 4))
    when(m4.startsWith("FFD8FF"), "jpeg")
      .when(m4 === "89504E47", "png")
      .when(m4 === "47494638", "gif")
      .when(m4 === "52494646", "riff")   // wav/avi/webp share RIFF
      .when(m8 === "66747970", "mp4")    // ....ftyp
      .otherwise("unknown")
  }

  /** Digest + size metadata block — shuffle-safe (bytes stay put). */
  def withBlobMeta(df: DataFrame, bytes: Column): DataFrame = df
    .withColumn("byte_len", octet_length(bytes))
    .withColumn("content_md5", md5(bytes))
    .withColumn("content_sha256", sha2(bytes, 256))
    .withColumn("format", sniffFormat(bytes))

  // ---- decode stages: real plumbing, stubbed kernel ----

  /** STUB codec: deterministic pseudo-decode so the pipeline is testable
    * without native codecs. Replace with a real codec (`???` marks the
    * swap points) keeping the signatures. */
  object FakeCodec {
    // real impl: ??? (e.g. TwelveMonkeys/javacpp-ffmpeg decode)
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val h = bytes.foldLeft(17L)((a, b) => (a * 31 + (b & 0xff)) % 1000003L)
      ((h % 640 + 64).toInt, (h / 640 % 480 + 48).toInt)
    }
    // real impl: ??? (CNN/CLIP-style encoder over decoded pixels)
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      var h = 1469598103934665603L
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 1099511628211L; i += 1 }
      var d = 0
      while (d < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(d) = (h >>> 40).toFloat / (1L << 24).toFloat - 0.5f
        d += 1
      }
      out
    }
  }

  /** Decode + embed in bounded batches per partition. The grouped iterator
    * is the batch contract: at most `batchSize` blobs are resident per
    * step, independent of partition size — the property that keeps
    * executors alive when blobs are MBs each. */
  def decodeAndEmbed(media: Dataset[MediaRow], dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h) = FakeCodec.decodeDims(r.bytes)
          MediaFeatures(r.media_id, r.kind, w, h,
            FakeCodec.embed(r.bytes, dim))
        }
      }
    }
  }

  /** Uniform-stride frame sampling: emit `k` frame references per video as
    * byte ranges into the blob (decode deferred — no bytes copied, no
    * shuffle). */
  def sampleFrames(media: Dataset[MediaRow], k: Int): Dataset[FrameRef] = {
    import media.sparkSession.implicits._
    media.filter(_.n_frames > 0).flatMap { r =>
      val n = math.min(k, r.n_frames)
      val frameLen = math.max(r.bytes.length.toLong / math.max(r.n_frames, 1), 1L)
      (0 until n).map { i =>
        val idx = (i.toLong * r.n_frames / n).toInt
        FrameRef(r.media_id, idx, idx * frameLen, frameLen)
      }
    }
  }

  /** Size-aware repartition before a decode stage: ~`targetBytes` of blob
    * per partition, so one huge partition can't OOM the codec. */
  def repartitionBySize(df: DataFrame, bytesCol: Column,
      targetBytes: Long): DataFrame = {
    val total = df.select(coalesce(sum(octet_length(bytesCol)).cast("long"),
      lit(0L))).head.getLong(0)
    val parts = math.max((total / targetBytes).toInt, 1)
    df.repartition(parts)
  }
}
