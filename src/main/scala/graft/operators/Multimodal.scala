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

/** Decoded-audio features (integer-typed for the oracle): PCM sample
  * statistics from the decoded stream, and the decode -> decimate ->
  * re-encode -> decode round trip of the same payload. */
case class AudioFeatures(
    doc_id: Long,
    n_samples: Long,
    amp_sum: Long,
    sq_sum: Long,
    zero_x: Long,
    peak: Long,
    ds_n: Long,
    ds_amp_sum: Long)

/** Decoded-video features (integer-typed for the oracle): frame count
  * from the container, pixel statistics from the SAMPLED decoded
  * frames, and a motion proxy (sum of absolute pixel deltas between
  * consecutive sampled frames). */
case class VideoFeatures(
    doc_id: Long,
    vid_w: Long,
    vid_h: Long,
    n_frames: Long,
    n_sampled: Long,
    px_sum: Long,
    motion_sum: Long)

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
 *  - AUDIO is REAL too: `javax.sound.sampled` also ships with the JDK,
 *    so the WAV lane ([[attachAudioPayload]] / [[decodeAudioFeatures]])
 *    encodes and decodes actual RIFF/WAVE PCM bytes on the executors.
 *    Payloads are deterministic synthetic signals — sample n of doc d
 *    is the pure integer function ((d*31 + n*17) mod 4001) - 2000 on
 *    16-bit mono PCM — so the oracle states every decoded sample
 *    analytically: PCM is lossless, and the features walk the DECODED
 *    stream, then a decimate -> re-encode -> decode round trip.
 *  - VIDEO is REAL at the multi-frame-container level: the JDK's GIF
 *    ImageWriter/ImageReader handle animated (multi-frame) GIF, so
 *    the video lane ([[attachVideoPayload]] / [[decodeVideoFeatures]])
 *    writes and reads actual multi-frame GIF bytes, and frame
 *    SAMPLING decodes only every `every`-th frame off the container
 *    index — the keyframe-extraction shape. GIF's 256-entry palette
 *    holds 8-bit gray losslessly, so the oracle is closed-form, BUT
 *    only with interlacing disabled: the JDK's default interlaced
 *    write round-trips with permuted/zeroed rows (measured on
 *    Temurin 17; `setProgressiveMode(MODE_DISABLED)` round-trips
 *    exactly, and [[synthGif]] pins that). A general-purpose codec
 *    (H.264 et al) is still out of container scope — GIF covers the
 *    container/frame-index/sampling semantics, not inter-frame
 *    compression.
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

  // ---- REAL audio lane: javax.sound.sampled WAV encode/decode -------

  /** PCM length varies per doc so the frame-count extraction cannot be
    * hardcoded: 200..299 samples. */
  private[graft] def audioLen(docId: Long): Int = 200 + (docId % 100).toInt

  /** Sample n of doc d — pure integer, stated verbatim in the oracle.
    * Range [-2000, 2000]; ascends by 17 and wraps mod 4001, so every
    * doc has sign structure (crossings) the features can see. */
  private[graft] def sampleAt(docId: Long, n: Int): Int =
    (((docId * 31 + n * 17) % 4001) - 2000).toInt

  private def pcmFormat: javax.sound.sampled.AudioFormat =
    new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, /*signed*/ true, /*bigEndian*/ false)

  /** Encode 16-bit LE mono PCM frames as REAL RIFF/WAVE bytes via the
    * JDK's AudioSystem. */
  private def wavBytes(pcm: Array[Byte], frames: Int): Array[Byte] = {
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), pcmFormat, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    val n = javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    require(n > 0, "graft: JDK AudioSystem wrote an empty WAV (should be impossible)")
    out.toByteArray
  }

  /** Deterministic synthetic mono 16-bit PCM signal for doc `docId`,
    * encoded as REAL WAV bytes. */
  private[graft] def synthWav(docId: Long): Array[Byte] = {
    val n = audioLen(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sampleAt(docId, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    wavBytes(pcm, n)
  }

  /** Attach a REAL WAV payload column (one synthetic signal per doc),
    * generated distributed on the executors. */
  def attachAudioPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, "audio/wav", synthWav(id))))
      .toDF()
  }

  /** Decode WAV bytes to 16-bit samples, validating the format loudly
    * (a silent format drift would corrupt every downstream number). */
  private def decodeWav(bytes: Array[Byte], id: Long): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian
        && f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"graft: doc $id decoded to an unexpected audio format $f")
    val pcm = ais.readAllBytes()
    require(pcm.length % 2 == 0, s"graft: doc $id odd PCM byte count ${pcm.length}")
    val out = new Array[Int](pcm.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toInt
      i += 1
    }
    out
  }

  /** REAL distributed audio decode: AudioSystem reads each WAV payload,
    * the features walk the DECODED sample stream (amplitude sum, energy,
    * zero crossings, peak), then a decimate-by-`factor` of the decoded
    * samples RE-ENCODES as WAV, decodes AGAIN and sums — the full codec
    * round trip, all executor-side. */
  def decodeAudioFeatures(spark: SparkSession, media: DataFrame,
      factor: Int = 4): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { m =>
          val s = decodeWav(m.payload, m.doc_id)
          var amp = 0L; var sq = 0L; var zx = 0L; var peak = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i)
            val a = math.abs(v).toLong
            amp += a; sq += v.toLong * v; if (a > peak) peak = a
            if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zx += 1
            i += 1
          }
          // decimate the DECODED stream, re-encode, decode again
          val dn = (s.length + factor - 1) / factor
          val pcm = new Array[Byte](dn * 2)
          i = 0
          while (i < dn) {
            val v = s(i * factor)
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val ds = decodeWav(wavBytes(pcm, dn), m.doc_id)
          var dsAmp = 0L
          i = 0
          while (i < ds.length) { dsAmp += math.abs(ds(i)).toLong; i += 1 }
          AudioFeatures(m.doc_id, s.length.toLong, amp, sq, zx, peak,
            ds.length.toLong, dsAmp)
        }
      }
  }

  // ---- REAL video lane: javax.imageio multi-frame GIF ---------------

  /** Frame geometry/count vary per doc: w in [8, 15], h in [4, 7],
    * frames in [3, 6]. */
  private[graft] def videoDims(docId: Long): (Int, Int, Int) =
    (8 + (docId % 8).toInt, 4 + (docId % 4).toInt, 3 + (docId % 4).toInt)

  /** Pixel (x, y) of frame f for doc d — pure integer, stated verbatim
    * in the oracle. */
  private[graft] def videoPixel(docId: Long, f: Int, x: Int, y: Int): Int =
    ((docId + 11L * f + x + 2L * y) % 256L).toInt

  /** Deterministic synthetic multi-frame (animated) GIF for doc
    * `docId`. Interlacing is explicitly DISABLED: the JDK GIF writer's
    * default interlaced output does not round-trip (rows permute /
    * zero on read back — measured), while MODE_DISABLED round-trips
    * every 8-bit gray pixel exactly. */
  private[graft] def synthGif(docId: Long): Array[Byte] = {
    val (w, h, frames) = videoDims(docId)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, videoPixel(docId, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), p)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Attach a REAL multi-frame GIF payload column (one synthetic clip
    * per doc), generated distributed on the executors. */
  def attachVideoPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map(id => MediaRow(id, "image/gif", synthGif(id)))
      }
      .toDF()
  }

  /** REAL distributed video decode with frame SAMPLING: the container
    * index (getNumImages) is read for every payload, but only every
    * `every`-th frame is DECODED (reader.read(i) is per-frame lazy —
    * the unsampled majority never decompresses), the keyframe-
    * extraction cost shape. Features: sampled pixel sum + a motion
    * proxy (absolute pixel delta between consecutive sampled frames,
    * both already decoded — no extra reads). */
  def decodeVideoFeatures(spark: SparkSession, media: DataFrame,
      every: Int = 2): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { m =>
          val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          try {
            reader.setInput(javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(m.payload)))
            val n =
              try reader.getNumImages(true)
              catch { case e: Exception =>
                throw new IllegalArgumentException(
                  s"graft: undecodable video payload for doc ${m.doc_id}", e) }
            require(n > 0, s"graft: empty video container for doc ${m.doc_id}")
            var pxSum = 0L; var motion = 0L; var sampled = 0L
            var w = 0L; var h = 0L
            var prev: Array[Int] = null
            var f = 0
            while (f < n) {
              // only sampled frames reach read(); carry the doc id on a
              // corrupt-frame failure (the container index parsed, so
              // the getNumImages guard above can no longer catch it)
              val img =
                try reader.read(f)
                catch { case e: Exception =>
                  throw new IllegalArgumentException(
                    s"graft: undecodable video frame $f for doc ${m.doc_id}", e) }
              if (w == 0) { w = img.getWidth.toLong; h = img.getHeight.toLong }
              // delta/sub-rect frames (real-world animated GIFs often
              // encode only the changed rectangle) would misalign the
              // motion diff or overrun prev — refuse loudly rather than
              // compute a silently wrong number
              require(img.getWidth.toLong == w && img.getHeight.toLong == h,
                s"graft: doc ${m.doc_id} frame $f is ${img.getWidth}x${img.getHeight}, " +
                  s"container is ${w}x$h — delta-frame video is not supported")
              val cur = new Array[Int](img.getWidth * img.getHeight)
              var i = 0; var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val v = img.getRGB(x, y) & 0xff // gray palette: R=G=B
                  cur(i) = v; pxSum += v
                  if (prev != null) motion += math.abs(v - prev(i)).toLong
                  i += 1; x += 1
                }
                y += 1
              }
              sampled += 1; prev = cur
              f += every
            }
            VideoFeatures(m.doc_id, w, h, n.toLong, sampled, pxSum, motion)
          } finally reader.dispose()
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
