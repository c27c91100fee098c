package graft

import java.nio.charset.StandardCharsets

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** Property-based WARC framing invariants, driven through the PARSER
  * directly (no Spark session — the framing is the risk surface, the
  * binaryFile plumbing is spec'd in WarcSpec): for any batch of
  * records with arbitrary printable content — including content that
  * CONTAINS header-looking lines, CRLFs, and "WARC/1.0" itself — the
  * length-framed parse recovers every record byte-exactly, plain and
  * per-record-gzip. Explicit seeded drive loop (the scalatest-
  * scalacheck bridge is not in the offline cache). */
class WarcPropertySpec extends AnyFunSuite {

  // printable-ish content with embedded CRLFs and framing look-alikes
  private val genContent: Gen[String] = for {
    base <- Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("\r\n"),
      Gen.const("WARC/1.0"),
      Gen.const("Content-Length: 7"),
      Gen.const("<html>&amp;</html>")))
  } yield base.mkString(" ")

  private val genRecord: Gen[(String, String, String)] = for {
    id <- Gen.uuid.map(_.toString)
    n <- Gen.choose(0, 999999)
    content <- genContent
  } yield (id, s"http://x.local/doc/$n", content)

  private def cases[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("any record batch round-trips byte-exactly through render -> parse, plain and gzip") {
    for (i <- 0 until 40) {
      val recs = cases(genRecord, 1 + i % 7, 0xAA00L + i)
      val body = recs.map { case (id, uri, c) =>
        Warc.renderRecord("response", id, uri, "2026-01-01T00:00:00Z",
          c.getBytes(StandardCharsets.UTF_8))
      }
      val plain = body.flatten.toArray
      val gz = Warc.gunzipAll(body.map(Warc.gzipMember).flatten.toArray)
      for ((bytes, tag) <- Seq((plain, "plain"), (gz, "gzip"))) {
        val rows = Warc.parseFile(bytes).toSeq
        assert(rows.length == recs.length, s"case $i $tag: row count")
        for (((id, uri, c), r) <- recs.zip(rows)) {
          assert(r.getString(0) == "response", s"case $i $tag type")
          assert(r.getString(1) == id, s"case $i $tag id")
          assert(r.getString(2) == uri, s"case $i $tag uri")
          assert(r.getString(4) == c, s"case $i $tag content")
          assert(r.isNullAt(6), s"case $i $tag error")
        }
      }
    }
  }
}
