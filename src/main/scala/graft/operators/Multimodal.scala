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

/** Decoded-image features (integer-typed for the oracle): dimensions
  * from the decoded header, pixel sums from the decoded raster, and
  * the decode->resize->re-encode->decode round trip of the same
  * payload. */
case class ImageFeatures(
    doc_id: Long,
    img_w: Long,
    img_h: Long,
    px_sum: Long,
    px_mean_x100: Long,
    rs_w: Long,
    rs_h: Long,
    rs_sum: Long)

/**
 * Multimodal-column plumbing: image/audio/video as opaque BINARY
 * columns with typed metadata, and a distributed decode/feature-extract
 * stage over `mapPartitions`.
 *
 * Two lanes:
 *  - IMAGE is REAL: `javax.imageio` ships with the JDK (zero new
 *    dependencies in a zero-egress container), so the PNG lane
 *    ([[attachImagePayload]] / [[decodeImageFeatures]]) encodes and
 *    decodes actual PNG bytes on the executors. The payloads are
 *    deterministic synthetic images — pixel (x, y) of doc d is the
 *    pure integer function (d + x + y) mod 256 on an 8-bit gray
 *    raster — so the DuckDB oracle can verify the DECODED features
 *    analytically: PNG is lossless, and any drift anywhere in the
 *    encode -> decode -> raster-walk -> nearest-neighbor-resize ->
 *    re-encode -> decode chain breaks the hash.
 *  - AUDIO/VIDEO remain a STUB (`decodeStub`): no codecs in this
 *    container. The Spark-side plumbing — schema, batch iteration,
 *    per-partition decoder initialization, frame sampling — is real
 *    and is what carries over to a production codec.
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

  // ---- REAL image lane: javax.imageio PNG encode/decode -------------

  /** Image dimensions vary per doc so the metadata extraction cannot
    * be hardcoded: w in [16, 31], h in [8, 15]. */
  private[graft] def imageDims(docId: Long): (Int, Int) =
    (16 + (docId % 16).toInt, 8 + (docId % 8).toInt)

  /** Deterministic synthetic 8-bit gray image for doc `docId`, encoded
    * as REAL PNG bytes via ImageIO. Raster writes go through
    * setSample — no color-space conversion touches the values, so the
    * byte at (x, y) is exactly (docId + x + y) mod 256. */
  private[graft] def synthPng(docId: Long): Array[Byte] = {
    val (w, h) = imageDims(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((docId + x + y) % 256L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "graft: JDK ImageIO has no png writer (should be impossible)")
    bos.toByteArray
  }

  /** Attach a REAL PNG payload column (one synthetic image per doc),
    * generated distributed — the encoder runs on the executors inside
    * the same mapPartitions session shape a production pipeline uses. */
  def attachImagePayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition init: no temp-file cache
        ids.map(id => MediaRow(id, "image/png", synthPng(id)))
      }
      .toDF()
  }

  /** Nearest-neighbor integer downscale on the DECODED raster —
    * out(x, y) = in(x*factor, y*factor), output dims = ceil(dim /
    * factor) — then RE-ENCODED as PNG. Exact by construction, so the
    * oracle can state the resized pixel values in closed form. */
  private def resizeNearest(img: java.awt.image.BufferedImage,
      factor: Int): java.awt.image.BufferedImage = {
    val w2 = (img.getWidth + factor - 1) / factor
    val h2 = (img.getHeight + factor - 1) / factor
    val out = new java.awt.image.BufferedImage(
      w2, h2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val src = img.getRaster; val dst = out.getRaster
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        dst.setSample(x, y, 0, src.getSample(x * factor, y * factor, 0))
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL distributed decode: ImageIO.read each PNG payload, walk the
    * decoded raster for pixel statistics, nearest-neighbor-downscale,
    * re-encode, decode AGAIN and sum — the full round trip a media
    * pipeline pays, all on executor-side rasters (getSample reads raw
    * band values; no color-space conversion can blur the oracle). */
  def decodeImageFeatures(spark: SparkSession, media: DataFrame,
      factor: Int = 4): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        def graySum(img: java.awt.image.BufferedImage): Long = {
          val r = img.getRaster
          var sum = 0L; var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sum += r.getSample(x, y, 0); x += 1 }
            y += 1
          }
          sum
        }
        def decode(bytes: Array[Byte], id: Long): java.awt.image.BufferedImage = {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"graft: undecodable image payload for doc $id")
          img
        }
        rows.map { m =>
          val img = decode(m.payload, m.doc_id)
          val (w, h) = (img.getWidth, img.getHeight)
          val sum = graySum(img)
          // resize on the decoded raster, RE-ENCODE, decode again: the
          // resized stats come from a second full codec round trip.
          // The write's boolean is checked (same as synthPng): an
          // unchecked false would leave rbos empty and surface as a
          // misattributed "undecodable payload" on the decode below
          val rbos = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(resizeNearest(img, factor), "png", rbos),
            s"graft: executor ImageIO has no png writer (doc ${m.doc_id})")
          val rimg = decode(rbos.toByteArray, m.doc_id)
          ImageFeatures(m.doc_id, w.toLong, h.toLong, sum,
            if (w * h == 0) 0L else sum * 100L / (w * h),
            rimg.getWidth.toLong, rimg.getHeight.toLong, graySum(rimg))
        }
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
