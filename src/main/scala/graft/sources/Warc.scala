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
      gzip: Boolean = true, maxRows: Int = 1000000): Unit = {
    val rows = df.select(col("record_id"), col("target_uri"),
        col("warc_date"), col("content")).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"graft: the WARC writer is a fixture generator; > $maxRows rows — production WARC is read, not written")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val ext = if (gzip) "warc.gz" else "warc"
    val outs = Array.tabulate(shards) { s =>
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(
        s"$dir/fixture-${"%05d".format(s)}.$ext"))
    }
    try rows.zipWithIndex.foreach { case (r, i) =>
      val rec = renderRecord("response", r.getString(0), r.getString(1),
        r.getString(2), r.getString(3).getBytes(StandardCharsets.UTF_8))
      outs(i % shards).write(if (gzip) gzipMember(rec) else rec)
    } finally outs.foreach(_.close())
  }

  // ---- reader (the scale path) ---------------------------------------

  private[graft] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    // GZIPInputStream reads CONCATENATED members transparently — the
    // per-record-member layout decompresses as one logical stream
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** Parse one (decompressed) WARC file body into records. Malformed
    * framing yields one `_corrupt` row for the unparseable tail and
    * stops — a length-framed format cannot resynchronize reliably
    * after a broken Content-Length, and guessing silently corrupts
    * record boundaries. */
  private[graft] def parseFile(bytes: Array[Byte]): Iterator[Row] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var pos = 0
    def corrupt(msg: String): Unit = {
      out += Row(s"_corrupt", null, null, null, null, 0L, s"$msg at offset $pos")
    }
    // index of the CRLF ending the line starting at `from`, -1 if the
    // data ends without one (truncated header)
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    while (pos < bytes.length) {
      // skip inter-record padding (tolerate extra CRLFs)
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n') pos += 2
      if (pos >= bytes.length) return out.iterator
      val vEnd = lineEnd(pos)
      if (vEnd < 0) { corrupt("truncated version line"); return out.iterator }
      val version = new String(bytes, pos, vEnd - pos, StandardCharsets.UTF_8)
      if (!version.startsWith("WARC/")) { corrupt(s"expected WARC version line, got '${version.take(40)}'"); return out.iterator }
      pos = vEnd + 2
      var warcType: String = null; var recordId: String = null
      var targetUri: String = null; var date: String = null
      var contentLen: Long = -1L
      var headerOk = true
      var done = false
      while (!done && headerOk) {
        val hEnd = lineEnd(pos)
        if (hEnd < 0) { corrupt("unterminated header block"); headerOk = false }
        else {
          val line = new String(bytes, pos, hEnd - pos, StandardCharsets.UTF_8)
          pos = hEnd + 2
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
            case _ => corrupt(s"malformed header line '${line.take(40)}'"); headerOk = false
          }
        }
      }
      if (!headerOk) return out.iterator
      if (contentLen < 0 || pos + contentLen > bytes.length) {
        corrupt(s"bad Content-Length $contentLen"); return out.iterator
      }
      // WARC-Type is mandatory (ISO 28500 §5.5) and readClean keys on
      // it — a well-framed record missing it quarantines (the framing
      // is intact, so parsing CONTINUES with the next record)
      if (warcType == null) {
        corrupt("missing mandatory WARC-Type header")
        pos += contentLen.toInt
      } else {
        // STRICT UTF-8 decode: this is the text lane, and a malformed
        // byte sequence must quarantine loudly, not silently become
        // U+FFFD mush that no longer matches content_len (a binary-
        // payload lane would carry bytes, not String)
        val dec = StandardCharsets.UTF_8.newDecoder() // REPORT on malformed
        try {
          val content = dec.decode(java.nio.ByteBuffer.wrap(
            bytes, pos, contentLen.toInt)).toString
          out += Row(warcType, recordId, targetUri, date, content, contentLen, null)
        } catch { case _: java.nio.charset.CharacterCodingException =>
          corrupt(s"record block is not valid UTF-8 (id=$recordId)")
        }
        pos += contentLen.toInt
      }
    }
    out.iterator
  }

  /** Read WARC shards DISTRIBUTED: one binaryFile task per shard file
    * (`.warc` plain or `.warc.gz` multi-member), executor-side framing
    * parse. Corrupt framing surfaces as `warc_type = '_corrupt'` rows
    * with the reason — filter them out or fail on them explicitly. */
  def read(spark: SparkSession, glob: String): DataFrame = {
    val parsed = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .rdd.flatMap { r =>
        val body = r.getAs[Array[Byte]](1)
        // gzip-layer corruption (truncated member, 0-byte shard) is
        // quarantined like framing corruption — the contract is
        // never-fatal, and the gzip stream dies BEFORE parseFile's
        // own quarantine could see anything
        if (r.getString(0).endsWith(".gz")) {
          try parseFile(gunzipAll(body))
          catch { case e: java.io.IOException =>
            Iterator(Row("_corrupt", null, null, null, null, 0L,
              s"gzip stream failed in ${r.getString(0).split('/').last}: ${e.getMessage}"))
          }
        } else parseFile(body)
      }
    spark.createDataFrame(parsed, schema)
  }

  /** The clean-records view: corrupt rows dropped, quarantine count
    * available separately via the `_corrupt` filter. */
  def readClean(spark: SparkSession, glob: String): DataFrame =
    read(spark, glob).where(col("warc_type") =!= "_corrupt")
}
