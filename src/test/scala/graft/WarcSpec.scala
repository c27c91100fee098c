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
