package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** WARC framing per ISO 28500 + the Common Crawl per-record-gzip-member
  * layout: byte-level golden framing, plain and gzip round trips,
  * quarantine (never silent-drop, never fatal) on malformed input. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixtureDf = Seq(
    ("00000000-0000-4000-8000-000000000001", "http://corpus.local/doc/1",
      "2026-01-01T00:00:00Z", "hello warc"),
    ("00000000-0000-4000-8000-000000000002", "http://corpus.local/doc/2",
      "2026-01-01T00:00:00Z", "second record, longer content body"),
    ("00000000-0000-4000-8000-000000000003", "http://corpus.local/doc/3",
      "2026-01-01T00:00:00Z", ""))
    .toDF("record_id", "target_uri", "warc_date", "content")

  test("renderRecord frames per the spec: version line, headers, length-exact block, CRLF CRLF") {
    val rec = new String(Warc.renderRecord("response", "id-1",
      "http://x/1", "2026-01-01T00:00:00Z",
      "abc".getBytes(StandardCharsets.UTF_8)), StandardCharsets.UTF_8)
    assert(rec.startsWith("WARC/1.0\r\n"))
    assert(rec.contains("WARC-Type: response\r\n"))
    assert(rec.contains("WARC-Record-ID: <urn:uuid:id-1>\r\n"))
    assert(rec.contains("Content-Length: 3\r\n"))
    assert(rec.endsWith("\r\n\r\nabc\r\n\r\n"))
  }

  test("round trip, plain and gzip (multi-member): every header and byte of content survives") {
    for (gzip <- Seq(false, true)) {
      val dir = Files.createTempDirectory(s"graft-warc-$gzip").toString
      Warc.writeFixture(fixtureDf, dir, shards = 2, gzip = gzip)
      val ext = if (gzip) "warc.gz" else "warc"
      assert(new java.io.File(dir).list().count(_.endsWith(ext)) == 2)
      val got = Warc.read(spark, s"$dir/*").collect()
        .map(r => r.getString(1) -> r).toMap
      assert(got.size == 3)
      for (r <- fixtureDf.collect()) {
        val g = got(r.getString(0))
        assert(g.getString(0) == "response")
        assert(g.getString(2) == r.getString(1)) // target_uri
        assert(g.getString(3) == r.getString(2)) // warc_date
        assert(g.getString(4) == r.getString(3)) // content, byte-exact
        assert(g.getLong(5) == r.getString(3).getBytes(StandardCharsets.UTF_8).length.toLong)
        assert(g.isNullAt(6))
      }
    }
  }

  test("zstd shards (.warc.zst): multi-frame and whole-shard frames both round-trip; corruption quarantines") {
    // VERDICT r15 next #5: real Common Crawl mirrors increasingly ship
    // .warc.zst. Re-compress a plain fixture both ways the wild ships
    // it — one zstd frame per record (the gzip-member layout's
    // analogue) and one whole-shard frame — through both entry points.
    val plain = Files.createTempDirectory("graft-warc-zsrc").toString
    Warc.writeFixture(fixtureDf, plain, shards = 1, gzip = false)
    val raw = java.nio.file.Files.readAllBytes(
      new java.io.File(plain).listFiles().head.toPath)
    def zstd(bytes: Array[Byte]): Array[Byte] =
      com.github.luben.zstd.Zstd.compress(bytes, 3)
    // split the shard at record boundaries (\r\n\r\n after each block;
    // renderRecord ends every record with CRLF CRLF) — per-record frames
    val text = new String(raw, StandardCharsets.ISO_8859_1)
    val cuts = "(?s)WARC/1\\.0.*?\\r\\n\\r\\n.*?\\r\\n\\r\\n".r
      .findAllIn(text).toSeq
    assert(cuts.size == 3, s"fixture split found ${cuts.size} records")
    val dir = Files.createTempDirectory("graft-warc-zst").toString
    val perRecord = cuts.flatMap(c =>
      zstd(c.getBytes(StandardCharsets.ISO_8859_1)).toSeq).toArray
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/multi-00000.warc.zst"), perRecord)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/whole-00001.warc.zst"), zstd(raw))
    for (df <- Seq(Warc.read(spark, s"$dir/*"),
        spark.read.format("graft-warc").load(s"$dir/*"))) {
      val got = df.where($"warc_type" =!= "_corrupt").collect()
      assert(got.length == 6, s"expected 2x3 records, got ${got.length}")
      val contents = got.map(_.getAs[String]("content")).sorted.toSeq
      assert(contents == Seq("", "", "hello warc", "hello warc",
        "second record, longer content body", "second record, longer content body"))
    }
    // truncated LAST frame of a multi-frame shard: quarantine row for
    // the tail, records from the intact earlier frames kept (a tiny
    // whole-shard frame decodes in one block, so truncating IT loses
    // everything — which is also correct, just not the case that
    // proves mid-file behavior)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/multi-00000.warc.zst"),
      perRecord.dropRight(7))
    val rows = Warc.read(spark, s"$dir/multi-*").collect()
    assert(rows.exists(_.getString(0) == "_corrupt"),
      "truncated zstd shard did not quarantine")
    assert(rows.count(_.getString(0) == "response") >= 1,
      "records before the corruption point were lost")
  }

  test("gzip members really are per-record: N records -> N gzip magic headers") {
    val dir = Files.createTempDirectory("graft-warc-members").toString
    Warc.writeFixture(fixtureDf, dir, shards = 1, gzip = true)
    val bytes = Files.readAllBytes(
      new java.io.File(dir).listFiles().head.toPath)
    val magics = (0 until bytes.length - 1).count(i =>
      (bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b)
    assert(magics == 3, s"expected 3 gzip members, found $magics")
  }

  test("malformed framing quarantines the tail as _corrupt rows, keeps prior records") {
    val dir = Files.createTempDirectory("graft-warc-bad").toString
    val good = Warc.renderRecord("response", "id-1", "http://x/1",
      "2026-01-01T00:00:00Z", "fine".getBytes(StandardCharsets.UTF_8))
    // bad Content-Length (overruns the file)
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nshort")
      .getBytes(StandardCharsets.UTF_8)
    Files.write(java.nio.file.Paths.get(dir, "mixed.warc"), good ++ bad)
    // garbage from byte 0 in a second shard (with a CRLF so the
    // version check, not the truncation check, fires)
    Files.write(java.nio.file.Paths.get(dir, "garbage.warc"),
      "not a warc at all\r\nmore bytes".getBytes(StandardCharsets.UTF_8))
    val rows = Warc.read(spark, s"$dir/*").collect()
    val clean = rows.filter(_.getString(0) != "_corrupt")
    val corrupt = rows.filter(_.getString(0) == "_corrupt")
    assert(clean.length == 1 && clean.head.getString(1) == "id-1")
    assert(corrupt.length == 2)
    assert(corrupt.exists(r => r.getString(6).contains("bad Content-Length")))
    assert(corrupt.exists(r => r.getString(6).contains("expected WARC version line")))
    assert(Warc.readClean(spark, s"$dir/*").count() == 1)
  }

  test("gzip-layer corruption quarantines, never kills the read: 0-byte and truncated .gz shards") {
    val dir = Files.createTempDirectory("graft-warc-gzbad").toString
    Warc.writeFixture(fixtureDf.limit(1), dir, shards = 1, gzip = true)
    val goodGz = new java.io.File(dir).listFiles().head
    // 0-byte shard (also what writeFixture(shards > rows) produces):
    // binaryFile skips empty files, so it contributes NO rows — zero
    // records lost, not a quarantine case
    Files.write(java.nio.file.Paths.get(dir, "empty.warc.gz"), Array.emptyByteArray)
    // truncated member: drop the second half of a valid gz file
    val gzBytes = Files.readAllBytes(goodGz.toPath)
    Files.write(java.nio.file.Paths.get(dir, "trunc.warc.gz"),
      java.util.Arrays.copyOfRange(gzBytes, 0, gzBytes.length / 2))
    val rows = Warc.read(spark, s"$dir/*").collect()
    val clean = rows.filter(_.getString(0) != "_corrupt")
    val corrupt = rows.filter(_.getString(0) == "_corrupt")
    assert(clean.length == 1)
    assert(corrupt.length == 1)
    assert(corrupt.head.getString(6).contains("gzip stream failed"))
    assert(corrupt.head.getString(6).contains("trunc.warc.gz"))
  }

  test("garbage between gzip members quarantines the tail LOUDLY, keeps prior records") {
    // GZIPInputStream's concatenated-member mode silently treats a
    // corrupt next-member header as EOF — every record after it would
    // be dropped with no quarantine row. The member-by-member decoder
    // must instead fail loudly and quarantine.
    val dir = Files.createTempDirectory("graft-warc-gzgap").toString
    val rec1 = Warc.renderRecord("response", "id-1", "http://x/1",
      "2026-01-01T00:00:00Z", "before".getBytes(StandardCharsets.UTF_8))
    val rec2 = Warc.renderRecord("response", "id-2", "http://x/2",
      "2026-01-01T00:00:00Z", "after".getBytes(StandardCharsets.UTF_8))
    Files.write(java.nio.file.Paths.get(dir, "gap.warc.gz"),
      Warc.gzipMember(rec1) ++ "JUNK-BETWEEN-MEMBERS".getBytes(StandardCharsets.UTF_8) ++
        Warc.gzipMember(rec2))
    val rows = Warc.read(spark, s"$dir/*").collect()
    val clean = rows.filter(_.getString(0) != "_corrupt")
    val corrupt = rows.filter(_.getString(0) == "_corrupt")
    assert(clean.length == 1 && clean.head.getString(1) == "id-1")
    assert(corrupt.length == 1)
    assert(corrupt.head.getString(6).contains("garbage between gzip members"))
  }

  test("corrupted member payload (flipped byte) quarantines via deflate/CRC check, keeps prior records") {
    val dir = Files.createTempDirectory("graft-warc-gzflip").toString
    val rec1 = Warc.renderRecord("response", "id-1", "http://x/1",
      "2026-01-01T00:00:00Z", "before".getBytes(StandardCharsets.UTF_8))
    val rec2 = Warc.renderRecord("response", "id-2", "http://x/2",
      "2026-01-01T00:00:00Z", "corrupt me".getBytes(StandardCharsets.UTF_8))
    val m2 = Warc.gzipMember(rec2)
    m2(m2.length / 2) = (m2(m2.length / 2) ^ 0x55).toByte // mid-deflate flip
    Files.write(java.nio.file.Paths.get(dir, "flip.warc.gz"),
      Warc.gzipMember(rec1) ++ m2)
    val rows = Warc.read(spark, s"$dir/*").collect()
    val clean = rows.filter(_.getString(0) != "_corrupt")
    val corrupt = rows.filter(_.getString(0) == "_corrupt")
    assert(clean.length == 1 && clean.head.getString(1) == "id-1")
    // WHICH layer trips is data-dependent: a flipped byte can break the
    // deflate stream / member CRC (gzip-layer quarantine) or decode
    // into garbled bytes the FRAMING layer rejects — both quarantine
    // the tail, which is the contract
    assert(corrupt.length == 1)
    assert(corrupt.head.getString(6).contains("gzip stream failed in flip.warc.gz")
      || corrupt.head.getString(6).contains("at offset"), corrupt.head.getString(6))
  }

  test("scale: a > 2.5 GB-decompressed shard streams with O(record) memory (past the 2 GB array bound)") {
    // the old whole-shard path (readAllBytes into one Array[Byte])
    // hard-fails above Int.MaxValue bytes regardless of heap; the
    // member-by-member stream must parse it with flat per-record
    // memory. One ~1 MiB record gzipped once, its member bytes
    // repeated 2600x — decompressed 2.6e9 bytes, compressed ~10 MB.
    val dir = Files.createTempDirectory("graft-warc-scale").toString
    val unit = "the quick brown fox jumps over the lazy dog 0123456789 "
    val content = (unit * (1048576 / unit.length + 1)).take(1048576)
    val member = Warc.gzipMember(Warc.renderRecord("response",
      "00000000-0000-4000-8000-00000000cafe", "http://corpus.local/big",
      "2026-01-01T00:00:00Z", content.getBytes(StandardCharsets.UTF_8)))
    val n = 2600
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
      s"$dir/scale-00000.warc.gz"), 1 << 20)
    try (0 until n).foreach(_ => out.write(member)) finally out.close()
    val decompressed = n.toLong * (content.length + 200) // > 2.6e9
    assert(decompressed > Int.MaxValue.toLong, "fixture must exceed the array bound")
    import org.apache.spark.sql.functions._
    val agg = Warc.read(spark, s"$dir/*")
      .agg(
        count(lit(1)).as("rows"),
        sum(col("content_len")).as("bytes"),
        sum(when(col("warc_type") === "_corrupt", 1).otherwise(0)).as("corrupt"))
      .collect().head
    assert(agg.getLong(0) == n.toLong)
    assert(agg.getLong(1) == n.toLong * content.length)
    assert(agg.getLong(1) > 2500000000L)
    assert(agg.getLong(2) == 0L)
  }

  test("missing mandatory WARC-Type and invalid-UTF-8 blocks quarantine, parse continues") {
    val dir = Files.createTempDirectory("graft-warc-hdr").toString
    val noType = ("WARC/1.0\r\nWARC-Record-ID: <urn:uuid:id-2>\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val good = Warc.renderRecord("response", "id-3", "http://x/3",
      "2026-01-01T00:00:00Z", "fine".getBytes(StandardCharsets.UTF_8))
    // well-framed record whose block is malformed UTF-8 (lone 0xFF)
    val badUtf8 = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:id-4>\r\nContent-Length: 3\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8) ++
      Array[Byte](0x61, -1, 0x62) ++ "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
    val good2 = Warc.renderRecord("response", "id-5", "http://x/5",
      "2026-01-01T00:00:00Z", "tail".getBytes(StandardCharsets.UTF_8))
    Files.write(java.nio.file.Paths.get(dir, "x.warc"),
      noType ++ good ++ badUtf8 ++ good2)
    val rows = Warc.read(spark, s"$dir/*").collect()
    val clean = rows.filter(_.getString(0) != "_corrupt")
    val corrupt = rows.filter(_.getString(0) == "_corrupt")
    // BOTH well-framed bad records quarantine and BOTH good records
    // survive — framing-intact corruption does not stop the parse
    assert(clean.map(_.getString(1)).toSet == Set("id-3", "id-5"))
    assert(corrupt.length == 2)
    assert(corrupt.exists(_.getString(6).contains("missing mandatory WARC-Type")))
    assert(corrupt.exists(r => r.getString(6).contains("not valid UTF-8")
      && r.getString(6).contains("id-4")))
  }

  test("a lone CR at the end of a header value still terminates at the following CRLF (CR CR LF)") {
    // regression (r15 review): the streaming readLine consumed the
    // byte after a lone CR, so 'x\r\r\n' merged two lines and the
    // whole tail quarantined — the old whole-array scan ended the
    // line at the second CR, with trim repairing the value
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\r\n" +
      "WARC-Record-ID: <urn:uuid:id-cr>\r\nContent-Length: 2\r\n\r\nok\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val rows = Warc.parseFile(rec).toSeq
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "response") // trim repaired the \r
    assert(rows.head.getString(1) == "id-cr")
    assert(rows.head.getString(4) == "ok")
    assert(rows.head.isNullAt(6))
  }

  test("unknown headers are legal and skipped; extra inter-record padding tolerated") {
    val dir = Files.createTempDirectory("graft-warc-extra").toString
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\nX-Custom: whatever\r\n" +
      "WARC-Record-ID: <urn:uuid:id-9>\r\nContent-Length: 2\r\n\r\nok\r\n\r\n\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    Files.write(java.nio.file.Paths.get(dir, "x.warc"), rec ++ rec)
    val rows = Warc.readClean(spark, s"$dir/*").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getString(4) == "ok"))
  }
}
