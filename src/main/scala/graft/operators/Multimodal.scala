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

/** One sampled frame (frame-sampling output shape). */
case class Frame(doc_id: Long, frame_idx: Long, frame_bytes: Array[Byte])

/** Per-document frame-sampling + resize statistics (integer-typed for
  * the oracle). */
case class FrameAgg(
    doc_id: Long,
    n_frames_sampled: Long,
    sampled_sum: Long,
    resized_len: Long,
    resized_sum: Long)

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

  /** STUB resize: keep every `factor`-th byte — stands in for an image
    * downscale; a real implementation decodes, scales, re-encodes inside
    * the same per-partition codec session. */
  private def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Frame sampling: flatMap each payload into every `every`-th
    * FrameStride-byte window (video keyframe extraction shape: one
    * output row per SAMPLED frame — the unsampled majority never
    * materializes). */
  def sampleFrames(spark: SparkSession, media: DataFrame, every: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .flatMap { r =>
        val nFrames = (r.payload.length + FrameStride - 1) / FrameStride
        (0 until nFrames by every).iterator.map { f =>
          val from = f * FrameStride
          val until = math.min(from + FrameStride, r.payload.length)
          Frame(r.doc_id, f.toLong, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
  }

  /** Resized payloads (same media schema out, so the result feeds any
    * downstream media operator). */
  def resize(spark: SparkSession, media: DataFrame, factor: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec session init would happen here
        rows.map(r => MediaRow(r.doc_id, r.media_type, resizeStub(r.payload, factor)))
      }
  }

  /** Integer frame-sampling/resize statistics per document (the
    * oracle-checked query shape for the two stubs above). */
  def frameSampleStats(spark: SparkSession, media: DataFrame,
                       every: Int = 2, factor: Int = 4): Dataset[FrameAgg] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val p = r.payload
          val nFrames = (p.length + FrameStride - 1) / FrameStride
          var sampledSum = 0L
          var i = 0
          while (i < p.length) {
            if ((i / FrameStride) % every == 0) sampledSum += (p(i) & 0xff).toLong
            i += 1
          }
          val resized = resizeStub(p, factor)
          var rSum = 0L
          i = 0
          while (i < resized.length) { rSum += (resized(i) & 0xff).toLong; i += 1 }
          FrameAgg(r.doc_id,
            ((nFrames + every - 1) / every).toLong,
            sampledSum, resized.length.toLong, rSum)
        }
      }
  }
}
