package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal row: opaque binary payload + typed metadata. */
case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Extracted features for one payload. */
case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    byte_sum: Long,
    n_frames: Long,
    feat_mean_x100: Long)

/**
 * Multimodal-column plumbing: image/audio/video as opaque BINARY
 * columns with typed metadata, and a distributed decode/feature-extract
 * stage over `mapPartitions`.
 *
 * The DECODE STEP IS A STUB: this container has no image/audio codecs,
 * so `decodeStub` computes a deterministic fake feature vector from the
 * raw bytes. The Spark-side plumbing — schema, batch iteration,
 * per-partition decoder initialization, frame sampling — is real and
 * is what carries over to a production codec.
 */
object Multimodal {

  val FrameStride = 32

  /** Attach a binary payload column (here: utf-8 text bytes stand in
    * for a real media payload) + media-type metadata. */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("text/plain;source="), col("source")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** STUB decoder: a real implementation would initialize a codec once
    * per partition (lazy singleton) and decode each payload; we compute
    * deterministic byte statistics instead so tests/oracles are exact. */
  private def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff).toLong; i += 1 }
    val nFrames = (payload.length + FrameStride - 1) / FrameStride
    val meanX100 = if (payload.length == 0) 0L else sum * 100L / payload.length
    (sum, nFrames.toLong, meanX100)
  }

  /** Distributed decode/feature-extract: mapPartitions so a real codec
    * is initialized once per partition, not per row. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // real codec init would happen here, once per partition
        rows.map { r =>
          val (sum, frames, mean) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.payload.length.toLong, sum, frames, mean)
        }
      }
  }
}
