package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in per-partition batches.
  *
  * The Spark-side machinery here is REAL and tested: schemas, typed batch
  * iteration (mapPartitions over a case-class Dataset with bounded batch
  * buffers — the Scala analog of mapInPandas' batch shape), partition
  * sizing by payload bytes, and deterministic content addressing. The codec
  * work itself is a clearly-marked STUB (`FakeCodec`): the real decoders
  * (libjpeg/ffmpeg bindings) are not available in this environment, so the
  * stub derives deterministic pseudo-metadata and pseudo-features from the
  * bytes. Swapping in a real codec touches exactly one function.
  */
object Multimodal {

  /** Typed media row: payload + envelope. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class DecodedMeta(
      media_id: Long, kind: String, byte_len: Long,
      width: Int, height: Int, channels: Int,
      duration_ms: Long, content_sha: String, ok: Boolean)

  final case class MediaFeature(media_id: Long, feature: Array[Float], frames_sampled: Int)

  /** STUB codec — deterministic fake. A real implementation replaces these
    * three functions with actual decode / resize / frame-sample calls.
    */
  object FakeCodec {
    def decodeMeta(kind: String, payload: Array[Byte]): (Int, Int, Int, Long) = {
      val h = graft.core.TextKernels.mix64(java.util.Arrays.hashCode(payload).toLong)
      kind match {
        case "image" => (64 + (math.abs(h) % 1920).toInt, 64 + (math.abs(h >> 12) % 1080).toInt, 3, 0L)
        case "audio" => (0, 0, if ((h & 1) == 0) 1 else 2, 500 + math.abs(h % 60000))
        case _ => (320 + (math.abs(h) % 1600).toInt, 240 + (math.abs(h >> 8) % 840).toInt, 3, 1000 + math.abs(h % 120000))
      }
    }

    /** Deterministic pseudo-embedding of the payload (stand-in for a model
      * forward pass over decoded pixels/samples).
      */
    def extractFeature(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < payload.length) { h = graft.core.TextKernels.mix64(h ^ payload(i)); i += 1 }
      var d = 0
      while (d < dim) {
        h = graft.core.TextKernels.mix64(h)
        out(d) = ((h >> 11).toDouble / (1L << 52).toDouble).toFloat
        d += 1
      }
      out
    }

    def frameCount(kind: String, durationMs: Long, sampleEveryMs: Long): Int =
      if (kind == "image") 1 else math.max(1, (durationMs / math.max(1, sampleEveryMs)).toInt)
  }

  /** Decode stage: per-partition batched processing of binary payloads.
    * Batches are bounded by `batchBytes` so a partition of large blobs never
    * materializes more than one batch of decoded intermediates at a time —
    * the same contract a mapInPandas batch gives.
    */
  def decode(media: Dataset[MediaRow], batchBytes: Long = 64L << 20): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      new Iterator[DecodedMeta] {
        private val batch = new scala.collection.mutable.Queue[DecodedMeta]()
        override def hasNext: Boolean = batch.nonEmpty || it.hasNext
        override def next(): DecodedMeta = {
          if (batch.isEmpty) {
            var bytes = 0L
            while (it.hasNext && (bytes == 0L || bytes < batchBytes)) {
              val row = it.next()
              bytes += row.payload.length
              batch.enqueue(decodeOne(row))
            }
          }
          batch.dequeue()
        }
      }
    }
  }

  private def decodeOne(row: MediaRow): DecodedMeta = {
    try {
      val (w, h, ch, dur) = FakeCodec.decodeMeta(row.kind, row.payload)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(row.payload).take(8).map(b => f"${b & 0xff}%02x").mkString
      DecodedMeta(row.media_id, row.kind, row.payload.length.toLong, w, h, ch, dur, sha, ok = true)
    } catch {
      case _: Exception =>
        DecodedMeta(row.media_id, row.kind, row.payload.length.toLong, 0, 0, 0, 0L, "", ok = false)
    }
  }

  /** Feature-extract stage (frame-sampled for video/audio): one feature
    * vector per media id, dimension `dim`.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
                      sampleEveryMs: Long = 1000L): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { row =>
      val (_, _, _, dur) = FakeCodec.decodeMeta(row.kind, row.payload)
      val frames = FakeCodec.frameCount(row.kind, dur, sampleEveryMs)
      // frame-sample: fold per-frame features (stub: seed varies per frame)
      val acc = new Array[Float](dim)
      var f = 0
      while (f < frames) {
        val feat = FakeCodec.extractFeature(row.payload :+ f.toByte, dim)
        var d = 0
        while (d < dim) { acc(d) += feat(d) / frames; d += 1 }
        f += 1
      }
      MediaFeature(row.media_id, acc, frames)
    }
  }

  /** Partition a media table so each task sees ~targetBytes of payload:
    * binary workloads are sized by bytes, not rows.
    */
  def repartitionByBytes(df: DataFrame, payloadCol: String, targetBytes: Long): DataFrame = {
    val stats = df.select(sum(length(col(payloadCol))).cast("long")).head()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (total / math.max(1L, targetBytes)).toInt)
    df.repartition(parts)
  }
}
