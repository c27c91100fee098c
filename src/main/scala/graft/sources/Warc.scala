package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * WARC (Web ARChive, ISO 28500) ingestion — the container format
 * web-scale pretraining corpora actually arrive in (Common Crawl ships
 * WARC/WET/WAT). The reference has no web-ingest boundary at all; at
 * 100 TB the upstream is `.warc.gz` shards, so the engine owns it:
 *
 *  - record framing per the public spec: a `WARC/1.0` version line,
 *    `Name: value` header lines ending at an empty line, then exactly
 *    `Content-Length` octets of block, then CRLF CRLF;
 *  - gzip per the Common Crawl convention: each record is its OWN gzip
 *    member and members concatenate into one file (random access by
 *    offset). The reader handles both a multi-member `.gz` stream
 *    (java.util.zip reads concatenated members transparently) and
 *    plain uncompressed WARC;
 *  - malformed records are QUARANTINED (type `_corrupt` rows carrying
 *    the failure and byte offset), never dropped silently and never
 *    fatal — mid-file corruption loses the records of THAT tail only,
 *    exactly like the JSONL quarantine contract;
 *  - the parallelism grain is one task per WARC file (binaryFile
 *    source): the industry-standard layout is many ~1 GB shards, and
 *    per-member gzip makes in-file splitting pointless for a batch
 *    engine — the file count IS the parallelism at 100 TB.
 *
 * The writer exists for round-trip validation and fixture generation
 * (driver-side, row-capped) — production data flows INTO this reader,
 * not out of the writer.
 */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content", StringType),
    StructField("content_len", LongType),
    StructField("error", StringType)))

  private val Crlf = "\r\n"

  // ---- writer (fixture generation / round-trip validation) ----------

  /** Render one WARC/1.0 record (headers + block + record separator). */
  private[graft] def renderRecord(warcType: String, recordId: String,
      targetUri: String, date: String, content: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0").append(Crlf)
      .append("WARC-Type: ").append(warcType).append(Crlf)
      .append("WARC-Record-ID: <urn:uuid:").append(recordId).append(">").append(Crlf)
      .append("WARC-Target-URI: ").append(targetUri).append(Crlf)
      .append("WARC-Date: ").append(date).append(Crlf)
      .append("Content-Length: ").append(content.length).append(Crlf)
      .append(Crlf)
      .toString.getBytes(StandardCharsets.UTF_8)
    val sep = (Crlf + Crlf).getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + content.length + sep.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(content, 0, out, head.length, content.length)
    System.arraycopy(sep, 0, out, head.length + content.length, sep.length)
    out
  }

  private[graft] def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Write (record_id, target_uri, warc_date, content) rows as WARC
    * shard files under `dir` — `fixture-00000.warc` or, with
    * `gzip = true`, `.warc.gz` with ONE GZIP MEMBER PER RECORD (the
    * Common Crawl layout). Driver-side fixture writer by design; the
    * row cap guards a miscalled corpus-sized export. */
  def writeFixture(df: DataFrame, dir: String, shards: Int = 2,
      gzip: Boolean = true, maxRows: Int = 1000000,
      codec: String = ""): Unit = {
    // `codec` ("gzip" | "zstd" | "none") wins over the legacy boolean
    // when set — zstd shards carry one frame per record, the
    // random-access layout mirroring the per-member gzip convention
    val c = if (codec.nonEmpty) codec else if (gzip) "gzip" else "none"
    val rows = df.select(col("record_id"), col("target_uri"),
        col("warc_date"), col("content")).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"graft: the WARC writer is a fixture generator; > $maxRows rows — production WARC is read, not written")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val ext = c match {
      case "gzip" => "warc.gz"
      case "zstd" => "warc.zst"
      case _ => "warc"
    }
    val outs = Array.tabulate(shards) { s =>
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(
        s"$dir/fixture-${"%05d".format(s)}.$ext"))
    }
    try rows.zipWithIndex.foreach { case (r, i) =>
      val rec = renderRecord("response", r.getString(0), r.getString(1),
        r.getString(2), r.getString(3).getBytes(StandardCharsets.UTF_8))
      val framed = c match {
        case "gzip" => gzipMember(rec)
        case "zstd" => com.github.luben.zstd.Zstd.compress(rec)
        case _ => rec
      }
      outs(i % shards).write(framed)
    } finally outs.foreach(_.close())
  }

  // ---- reader (the scale path) ---------------------------------------

  /** Streams the decompressed concatenation of a multi-member gzip
    * file MEMBER BY MEMBER with O(buffer) memory — never a whole-shard
    * byte array (real Common Crawl shards are ~1 GB compressed and
    * 4-5 GB raw, past the 2 GB JVM array bound). Unlike
    * `GZIPInputStream`'s transparent concatenated-member mode — which
    * silently treats a corrupt next-member header or inter-member
    * garbage as end-of-stream, dropping every record after it — this
    * decoder FAILS LOUDLY (IOException) on:
    *
    *  - bytes between members that are not a gzip magic header,
    *  - a truncated member, header, or trailer,
    *  - corrupt deflate data,
    *  - a per-member CRC32 or ISIZE trailer mismatch.
    *
    * The caller maps the exception to a `_corrupt` quarantine row, so
    * the module's never-dropped-silently contract holds through the
    * gzip layer too. Immediate EOF before the first member (a 0-byte
    * shard) is a legal empty stream, not corruption. */
  private[graft] final class GzipMembersInputStream(raw: java.io.InputStream)
      extends java.io.InputStream {
    private val in = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(raw, 64 * 1024), 64 * 1024)
    private val inBuf = new Array[Byte](32 * 1024)
    private var lastLen = 0 // bytes of the current setInput segment
    private var inf: java.util.zip.Inflater = null
    private val crc = new java.util.zip.CRC32()
    private var memberBytes = 0L
    private var done = false
    private val one = new Array[Byte](1)

    private def fail(msg: String): Nothing = throw new java.io.IOException(msg)

    private def readFully(n: Int, what: String): Array[Byte] = {
      val b = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(b, off, n - off)
        if (r < 0) fail(s"truncated gzip $what")
        off += r
      }
      b
    }

    private def skipZeroTerminated(what: String): Unit = {
      var b = in.read()
      while (b > 0) b = in.read()
      if (b < 0) fail(s"truncated gzip $what")
    }

    /** Position `in` at the current member's deflate data, or set
      * `done` on clean EOF at a member boundary. RFC 1952 header:
      * magic, CM, FLG, MTIME(4), XFL, OS, then FLG-gated fields. */
    private def startMember(): Unit = {
      val b1 = in.read()
      if (b1 < 0) { done = true; return }
      val b2 = in.read()
      if (b2 < 0 || (b1 & 0xff) != 0x1f || (b2 & 0xff) != 0x8b)
        fail(f"garbage between gzip members (0x${b1 & 0xff}%02x) where a member header was expected")
      val hdr = readFully(8, "member header")
      if ((hdr(0) & 0xff) != 8) fail(s"unsupported gzip compression method ${hdr(0) & 0xff}")
      val flg = hdr(1) & 0xff
      if ((flg & 0x04) != 0) { // FEXTRA
        val xl = readFully(2, "FEXTRA length")
        readFully((xl(0) & 0xff) | ((xl(1) & 0xff) << 8), "FEXTRA field")
      }
      if ((flg & 0x08) != 0) skipZeroTerminated("FNAME field")
      if ((flg & 0x10) != 0) skipZeroTerminated("FCOMMENT field")
      if ((flg & 0x02) != 0) readFully(2, "FHCRC field")
      inf = new java.util.zip.Inflater(true)
      lastLen = 0
      crc.reset(); memberBytes = 0L
    }

    /** Verify the 8-byte CRC32+ISIZE trailer and return over-read
      * bytes (the inflater's readahead) to the stream — they belong to
      * the trailer and the next member. */
    private def finishMember(): Unit = {
      val rem = inf.getRemaining
      if (rem > 0) in.unread(inBuf, lastLen - rem, rem)
      inf.end(); inf = null
      val tr = readFully(8, "member trailer")
      def u32(o: Int): Long = (tr(o) & 0xffL) | ((tr(o + 1) & 0xffL) << 8) |
        ((tr(o + 2) & 0xffL) << 16) | ((tr(o + 3) & 0xffL) << 24)
      if (u32(0) != crc.getValue) fail("gzip member CRC32 mismatch")
      if (u32(4) != (memberBytes & 0xffffffffL)) fail("gzip member ISIZE mismatch")
    }

    override def read(): Int =
      if (read(one, 0, 1) < 0) -1 else one(0) & 0xff

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (done) return -1
        if (inf == null) startMember()
        else if (inf.finished()) finishMember()
        else {
          if (inf.needsInput) {
            val n = in.read(inBuf)
            if (n < 0) fail("truncated gzip member (deflate stream ends at EOF)")
            lastLen = n
            inf.setInput(inBuf, 0, n)
          }
          val n = try inf.inflate(b, off, len) catch {
            case e: java.util.zip.DataFormatException =>
              fail(s"corrupt deflate data: ${e.getMessage}")
          }
          if (n > 0) { crc.update(b, off, n); memberBytes += n; return n }
          // gzip never uses preset dictionaries (RFC 1952 has no field
          // for one) — a needsDictionary inflater here means corrupt
          // data, and looping on it would spin forever
          if (inf.needsDictionary) fail("deflate stream demands a preset dictionary (corrupt gzip member)")
          if (inf.finished()) finishMember()
        }
      }
      -1 // unreachable
    }

    override def close(): Unit = {
      if (inf != null) { inf.end(); inf = null }
      in.close()
    }
  }

  /** Decompress a multi-member gzip byte array (test/fixture-sized —
    * the scale path streams via [[GzipMembersInputStream]] directly). */
  private[graft] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GzipMembersInputStream(new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /**
   * Pass-through guard that validates zstandard FRAME STRUCTURE on the
   * compressed bytes flowing to the decoder (frame format per RFC 8878
   * §3.1, clean-room): magic, frame-header length from its descriptor,
   * block headers (last-block flag, type, size), optional content
   * checksum, skippable frames. Exists because zstd-jni's stream
   * decoder silently treats EOF after ANY completed frame as
   * end-of-data — a truncated or garbage TAIL frame in a multi-frame
   * shard would be silently dropped (byte-for-byte the
   * GZIPInputStream concatenated-mode failure the gzip member decoder
   * refuses). The guard throws on EOF mid-frame and on a non-magic
   * inter-frame byte, so the parse layer quarantines loudly instead.
   * It never buffers ahead of the caller and adds one state-machine
   * pass over the bytes.
   */
  private[graft] final class ZstdFrameGuardInputStream(in: java.io.InputStream)
      extends java.io.FilterInputStream(in) {
    // modes; `need` = bytes still required by the current element
    private var mode: Int = 0 // 0=MAGIC 1=DESC 2=HDR_REST 3=BLK_HDR 4=BLK_BODY 5=CKSUM 6=SKIP_SIZE 7=SKIP_BODY
    private var need: Long = 4L
    // largest accumulated element: frame-header tail = window(1) +
    // dictionary id(<=4) + frame content size(<=8) = 13 bytes
    private val hdr = new Array[Byte](16)
    private var hdrLen = 0
    private var checksumFlag = false
    private var frameStarted = false
    private val one = new Array[Byte](1)

    private def fail(msg: String): Nothing =
      throw new java.io.IOException(s"zstd frame guard: $msg")

    private def le(n: Int): Long = {
      var v = 0L; var i = n - 1
      while (i >= 0) { v = (v << 8) | (hdr(i) & 0xffL); i -= 1 }
      v
    }

    /** Advance the state machine over `len` bytes at b[off..). */
    private def feed(b: Array[Byte], off: Int, len: Int): Unit = {
      var i = off
      val end = off + len
      while (i < end) {
        if (mode == 4 || mode == 7) { // content bytes: skip in bulk
          val take = math.min(need, (end - i).toLong)
          need -= take; i += take.toInt
          if (need == 0L) {
            if (mode == 7) { mode = 0; need = 4 }            // skippable done
            else if (!lastBlock) { mode = 3; need = 3 }      // next block
            else if (checksumFlag) { mode = 5; need = 4 }    // frame checksum
            else { mode = 0; need = 4 }                      // frame complete
          }
        } else {
          hdr(hdrLen) = b(i); hdrLen += 1; i += 1; need -= 1
          if (need == 0L) dispatch()
        }
      }
    }

    private var lastBlock = false

    private def dispatch(): Unit = {
      val collected = hdrLen; hdrLen = 0
      mode match {
        case 0 => // magic (4 bytes LE)
          val m = le(4)
          if (m == 0xFD2FB528L) { frameStarted = true; mode = 1; need = 1 }
          else if (m >= 0x184D2A50L && m <= 0x184D2A5FL) { mode = 6; need = 4 }
          else fail(f"bad magic 0x$m%08x — garbage between frames or not zstd")
        case 1 => // frame header descriptor
          val d = hdr(0) & 0xff
          val fcsFlag = d >>> 6
          val singleSegment = (d & 0x20) != 0
          checksumFlag = (d & 0x04) != 0
          if ((d & 0x08) != 0) fail("reserved descriptor bit set")
          val didLen = Seq(0, 1, 2, 4)((d & 0x03))
          val fcsLen =
            if (fcsFlag == 0) { if (singleSegment) 1 else 0 }
            else Seq(0, 2, 4, 8)(fcsFlag)
          val rest = (if (singleSegment) 0 else 1) + didLen + fcsLen
          if (rest == 0) { mode = 3; need = 3 }
          else { mode = 2; need = rest.toLong }
        case 2 => // frame header tail consumed
          mode = 3; need = 3
        case 3 => // block header (3 bytes LE)
          val v = le(3)
          lastBlock = (v & 1L) != 0
          val btype = ((v >> 1) & 3L).toInt
          val bsize = v >> 3
          val content = btype match {
            case 0 => bsize      // raw
            case 1 => 1L         // RLE: one byte, bsize = regenerated size
            case 2 => bsize      // compressed
            case _ => fail("reserved block type")
          }
          if (content == 0L)
            mode = if (!lastBlock) { need = 3; 3 }
                   else if (checksumFlag) { need = 4; 5 } else { need = 4; 0 }
          else { mode = 4; need = content }
        case 4 => ()
        case 5 => // content checksum consumed — frame complete
          mode = 0; need = 4
        case 6 => // skippable frame size (4 bytes LE)
          val n = le(4)
          if (n == 0L) { mode = 0; need = 4 } else { mode = 7; need = n }
        case _ => ()
      }
      require(collected <= hdr.length) // state machine never collects more
    }

    private def atFrameBoundary: Boolean = mode == 0 && hdrLen == 0

    override def read(): Int = {
      val r = read(one, 0, 1)
      if (r < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val r = in.read(b, off, len)
      if (r < 0) {
        if (atFrameBoundary) -1
        else fail(if (frameStarted) "truncated frame at end of shard"
                  else "truncated frame header")
      } else { feed(b, off, r); r }
    }

    // skip must still pass bytes THROUGH the state machine
    override def skip(n: Long): Long = {
      val buf = new Array[Byte](8192)
      var done = 0L
      while (done < n) {
        val r = read(buf, 0, math.min(8192L, n - done).toInt)
        if (r < 0) return done
        done += r
      }
      done
    }
    override def markSupported(): Boolean = false
  }

  /** Headers are tiny (ISO 28500 named fields); a "header line" past
    * this bound means the framing is broken, and an unbounded line
    * accumulator would defeat the O(record) memory guarantee. */
  private val MaxHeaderLine = 64 * 1024

  /** Parse a decompressed WARC stream into records INCREMENTALLY —
    * memory is O(one record), never O(shard). Malformed framing yields
    * one `_corrupt` row for the unparseable tail and stops — a
    * length-framed format cannot resynchronize reliably after a broken
    * Content-Length, and guessing silently corrupts record boundaries.
    * Framing-intact corruption (missing WARC-Type, invalid UTF-8
    * block) quarantines that record and CONTINUES. IOExceptions from
    * the underlying stream (e.g. the gzip layer) propagate — the
    * caller quarantines them per file.
    *
    * `withContent = false` (a column-pruned scan): record blocks are
    * SKIPPED unread — no allocation, no UTF-8 decode — and `content`
    * is null. The parquet economics apply: content-level corruption
    * (invalid UTF-8) surfaces only when the content column is read;
    * framing corruption always surfaces. */
  private[graft] def parseStream(in0: java.io.InputStream,
      withContent: Boolean = true): Iterator[Row] = new Iterator[Row] {
    private val in = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(in0, 64 * 1024), 4)
    private var pos = 0L      // decompressed offset, for corrupt messages
    private var stopped = false // fatal framing corruption: no resync
    private var eof = false
    private var pending: Row = null
    private var overlong = false

    def hasNext: Boolean = {
      if (pending == null && !stopped && !eof) advance()
      pending != null
    }
    def next(): Row = {
      if (!hasNext) throw new NoSuchElementException("WARC stream exhausted")
      val r = pending; pending = null; r
    }

    private def corruptRow(msg: String): Row =
      Row("_corrupt", null, null, null, null, 0L, s"$msg at offset $pos")
    private def fatal(msg: String): Unit = { pending = corruptRow(msg); stopped = true }

    /** CRLF-terminated line; null = EOF (or the MaxHeaderLine bound,
      * flagged via `overlong`) before the terminator. Lone CRs stay in
      * the line, matching the two-byte-delimiter scan semantics — the
      * byte AFTER a lone CR is UNREAD so it can itself start a CRLF
      * (a 'x\r\r\n' line must terminate at the second CR, exactly as
      * the old whole-array scan did). */
    private def readLine(): String = {
      overlong = false
      val sb = new java.io.ByteArrayOutputStream(64)
      while (sb.size <= MaxHeaderLine) {
        val b = in.read()
        if (b < 0) return null
        pos += 1
        if (b == '\r') {
          val b2 = in.read()
          if (b2 < 0) return null
          if (b2 == '\n') {
            pos += 1
            return new String(sb.toByteArray, StandardCharsets.UTF_8)
          }
          sb.write(b)
          in.unread(b2)
        } else sb.write(b)
      }
      overlong = true
      null
    }

    private def advance(): Unit = {
      // skip inter-record padding (tolerate extra CRLFs); clean EOF
      // is only legal at a record boundary
      while (true) {
        val b1 = in.read()
        if (b1 < 0) { eof = true; return }
        if (b1 == '\r') {
          val b2 = in.read()
          if (b2 == '\n') { pos += 2 }
          else {
            if (b2 >= 0) in.unread(b2)
            in.unread(b1)
            parseRecord(); return
          }
        } else { in.unread(b1); parseRecord(); return }
      }
    }

    private def parseRecord(): Unit = {
      val version = readLine()
      if (version == null) {
        fatal(if (overlong) s"header line exceeds $MaxHeaderLine bytes" else "truncated version line"); return
      }
      if (!version.startsWith("WARC/")) {
        fatal(s"expected WARC version line, got '${version.take(40)}'"); return
      }
      var warcType: String = null; var recordId: String = null
      var targetUri: String = null; var date: String = null
      var contentLen: Long = -1L
      var done = false
      while (!done) {
        val line = readLine()
        if (line == null) {
          fatal(if (overlong) s"header line exceeds $MaxHeaderLine bytes" else "unterminated header block"); return
        }
        if (line.isEmpty) done = true
        else line.split(":", 2) match {
          case Array(k, v) =>
            k.trim.toLowerCase match {
              case "warc-type" => warcType = v.trim
              case "warc-record-id" =>
                recordId = v.trim.stripPrefix("<urn:uuid:").stripSuffix(">")
              case "warc-target-uri" => targetUri = v.trim
              case "warc-date" => date = v.trim
              case "content-length" =>
                contentLen = v.trim.toLongOption.getOrElse(-1L)
              case _ => () // unknown headers are legal, skipped
            }
          case _ => fatal(s"malformed header line '${line.take(40)}'"); return
        }
      }
      // a >2 GB single record breaks the JVM's array/String bound and
      // is far outside any sane WARC — quarantine like a negative
      if (contentLen < 0 || contentLen > Int.MaxValue - 16) {
        fatal(s"bad Content-Length $contentLen"); return
      }
      var block: Array[Byte] = null
      val short =
        if (withContent) {
          block = in.readNBytes(contentLen.toInt)
          if (block.length < contentLen) { pos += block.length; true } else false
        } else {
          try { in.skipNBytes(contentLen); false }
          catch { case _: java.io.EOFException => true }
        }
      if (short) { fatal(s"bad Content-Length $contentLen"); return }
      // WARC-Type is mandatory (ISO 28500 §5.5) and readClean keys on
      // it — a well-framed record missing it quarantines (the framing
      // is intact, so parsing CONTINUES with the next record)
      if (warcType == null) {
        pending = corruptRow("missing mandatory WARC-Type header")
        pos += contentLen
      } else if (!withContent) {
        pending = Row(warcType, recordId, targetUri, date, null, contentLen, null)
        pos += contentLen
      } else {
        // STRICT UTF-8 decode: this is the text lane, and a malformed
        // byte sequence must quarantine loudly, not silently become
        // U+FFFD mush that no longer matches content_len (a binary-
        // payload lane would carry bytes, not String)
        val dec = StandardCharsets.UTF_8.newDecoder() // REPORT on malformed
        try {
          val content = dec.decode(java.nio.ByteBuffer.wrap(block)).toString
          pending = Row(warcType, recordId, targetUri, date, content, contentLen, null)
        } catch { case _: java.nio.charset.CharacterCodingException =>
          pending = corruptRow(s"record block is not valid UTF-8 (id=$recordId)")
        }
        pos += contentLen
      }
    }
  }

  /** Whole-array parse (tests/fixtures); the scale path is [[parseStream]]. */
  private[graft] def parseFile(bytes: Array[Byte]): Iterator[Row] =
    parseStream(new java.io.ByteArrayInputStream(bytes))

  /** Compression codec from the shard extension: `.gz`/`.gzip` =
    * member-streaming gunzip (the Common Crawl random-access layout),
    * `.zst`/`.zstd` = zstandard frames (real CC mirrors increasingly
    * ship `.warc.zst`; zstd-jni is already on every Spark classpath —
    * Spark's own shuffle/event-log codec), anything else = plain. */
  private[sources] def codecOf(path: String): String =
    if (path.endsWith(".gz") || path.endsWith(".gzip")) "gzip"
    else if (path.endsWith(".zst") || path.endsWith(".zstd")) "zstd"
    else "none"

  /** Pull-parse one shard; ANY IOException from the codec/IO layer
    * becomes one final `_corrupt` row for the tail — records already
    * emitted before the corruption point stay emitted (mid-file
    * corruption loses THAT tail only), and the quarantine row carries
    * the shard name + cause. The stream opens lazily on first pull and
    * closes on exhaustion or failure. */
  private[sources] def fileRows(path: String, open: () => java.io.InputStream,
      codec: String, withContent: Boolean = true)
      : Iterator[Row] with AutoCloseable =
    new Iterator[Row] with AutoCloseable {
    private var wrapped: java.io.InputStream = null // owns base + inflater
    private var under: Iterator[Row] = null
    private var pending: Row = null
    private var closed = false

    private def quarantine(e: java.io.IOException): Unit = {
      val kind =
        if (codec == "none") "read failed" else s"$codec stream failed"
      pending = Row("_corrupt", null, null, null, null, 0L,
        s"$kind in ${path.split('/').last}: ${e.getMessage}")
      closeNow(); under = Iterator.empty
    }
    // closes the WRAPPER, not just the base stream: for a gzip shard
    // that is the only place a mid-member Inflater's native zlib state
    // is released (quarantine and early termination both stop mid-member)
    private def closeNow(): Unit = if (!closed) {
      closed = true
      if (wrapped != null) try wrapped.close() catch { case _: java.io.IOException => () }
    }
    /** Early-termination hook (limit/take): same as exhaustion. */
    override def close(): Unit = closeNow()

    def hasNext: Boolean = {
      if (pending != null) return true
      try {
        if (under == null) {
          if (closed) return false
          val base = open()
          wrapped = codec match {
            case "gzip" => new GzipMembersInputStream(base)
            // multi-frame streaming decode (one frame per record, the
            // gzip-member layout's zstd analogue, or one whole-shard
            // frame — ZstdInputStreamNoFinalizer reads frame sequences
            // either way); the frame guard makes a truncated/garbage
            // TAIL frame throw instead of silently dropping it (the
            // decoder accepts EOF after any completed frame); explicit
            // close releases the native context, which is why every
            // exit path runs closeNow()
            case "zstd" => new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
              new ZstdFrameGuardInputStream(
                new java.io.BufferedInputStream(base, 1 << 16)))
            case _ => base
          }
          under = parseStream(wrapped, withContent)
        }
        val h = under.hasNext
        if (!h) closeNow()
        h
      } catch { case e: java.io.IOException => quarantine(e); true }
    }
    def next(): Row = {
      if (!hasNext) throw new NoSuchElementException("WARC shard exhausted")
      if (pending != null) { val p = pending; pending = null; p }
      else try under.next() catch {
        case e: java.io.IOException => quarantine(e); val p = pending; pending = null; p
      }
    }
  }

  /** Read WARC shards DISTRIBUTED AND STREAMED: one task per shard
    * file (`.warc` plain or `.warc.gz` multi-member), executor-side
    * framing parse, memory bounded at O(one record) — a shard is never
    * materialized as a byte array, compressed or decompressed (real
    * Common Crawl shards decompress past the 2 GB JVM array bound).
    * The parallelism grain is one-file-per-task (an explicit file
    * list — see the body comment for why binaryFiles' combining
    * breaks this); per-member gzip makes in-file splitting pointless
    * for a batch engine — the file count IS the parallelism at
    * 100 TB. Corrupt framing, gzip-layer
    * corruption (garbage between members, truncated member, CRC
    * mismatch), and IO failure all surface as `warc_type = '_corrupt'`
    * rows with the reason — filter them out or fail on them
    * explicitly. */
  def read(spark: SparkSession, glob: String): DataFrame = {
    // The parallelism grain is ONE FILE PER TASK — enforced with an
    // explicit file list, not binaryFiles (r17, VERDICT r16 next #6):
    // binaryFiles rides CombineFileInputFormat whose split size floors
    // at the 4 MB open-cost constant, so any set of small-to-mid
    // shards silently COMBINES into one or two tasks — and because
    // the downstream parse -> extract -> quality chain is narrow, that
    // starvation carries to every consumer (pipeline_web read as a
    // 1.8x "WARC drift" that was really a near-single-task pipeline on
    // a 32-thread box; the V2 source, one partition per file, read the
    // same fixture 10x faster). Crawl shards are sized for exactly
    // this grain (~1 GB gzip members), and per-member compression
    // makes sub-file splits pointless for a batch engine.
    val conf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val files = WarcSource.resolveFiles(Seq(glob), conf.conf)
    val parsed = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { path =>
        val p = new org.apache.hadoop.fs.Path(path)
        val it = fileRows(path,
          () => p.getFileSystem(conf.conf).open(p), codecOf(path))
        // early termination (limit/take) or task kill must release the
        // open stream + a mid-member Inflater's native state — flatMap
        // never drains a truncated iterator, so hook the task lifecycle
        // (the V2 path gets this via PartitionReader.close; ADVICE r15 #5)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => it.close()))
        it
      }
    spark.createDataFrame(parsed, schema)
  }

  /** The clean-records view: corrupt rows dropped, quarantine count
    * available separately via the `_corrupt` filter. */
  def readClean(spark: SparkSession, glob: String): DataFrame =
    read(spark, glob).where(col("warc_type") =!= "_corrupt")
}
