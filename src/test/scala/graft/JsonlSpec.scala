package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jsonl

/** JSONL ingestion boundary: explicit-schema read, corrupt-line
  * quarantine (exact counts + raw lines), schema-drift-as-nulls, and
  * the write->read round trip over the real documents fixture. */
class JsonlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("round trip: documents fixture -> sharded JSONL -> identical rows") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Files.createTempDirectory("graft-jsonl").toString
    Jsonl.write(docs, out, shards = 4)
    // shard dirs materialized, membership a pure function of doc_id
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.length == 4)
    val back = Jsonl.read(spark, s"$out/shard=*")
    assert(back.where(col("_corrupt_line").isNotNull).count() == 0)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.drop("_corrupt_line").select(docs.columns.map(col).toIndexedSeq: _*)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("corrupt lines quarantine with raw text; clean rows unharmed") {
    val dir = Files.createTempDirectory("graft-jsonl-bad")
    val lines = Seq(
      """{"doc_id": 1, "text": "ok one", "lang": "en", "source": "web", "n_chars": 6}""",
      """{"doc_id": 2, "text": "ok two", "lang": "de", "source": "web", "n_chars": 6}""",
      """{"doc_id": 3, "text": "truncated...""", // unparseable
      """not json at all""")
    Files.write(dir.resolve("part-0.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    val (clean, bad) = Jsonl.readQuarantined(spark, dir.toString)
    assert(clean.count() == 2)
    assert(clean.orderBy("doc_id").as[(Long, String, String, String, Long)]
      .collect().head == ((1L, "ok one", "en", "web", 6L)))
    val rawBad = bad.as[String].collect().toSet
    assert(rawBad.size == 2 && rawBad.contains("not json at all"))
  }

  test("streaming twin: landing-dir stream == batch read (clean + quarantine)") {
    val dir = Files.createTempDirectory("graft-jsonl-stream")
    Files.write(dir.resolve("a.jsonl"),
      ("""{"doc_id": 1, "text": "s one", "lang": "en", "source": "web", "n_chars": 5}""" + "\n" +
       """broken line""").getBytes("UTF-8"))
    Files.write(dir.resolve("b.jsonl"),
      """{"doc_id": 2, "text": "s two", "lang": "de", "source": "web", "n_chars": 5}""".getBytes("UTF-8"))
    val sink = s"jsonl_stream_${System.nanoTime()}"
    assert(Jsonl.readStream(spark, dir.toString).writeStream
      .format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(60000), "stream did not drain in 60 s")
    val got = spark.table(sink)
    assert(got.where(col("_corrupt_line").isNull).count() == 2)
    assert(got.where(col("_corrupt_line").isNotNull).count() == 1)
    // same rows as the batch reader over the same dir
    val batch = Jsonl.read(spark, dir.toString)
    assert(got.orderBy("doc_id").collect().toSeq ==
      batch.orderBy("doc_id").collect().toSeq)
  }

  test("gzip export round-trips: compressed shard parts, identical rows back") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Files.createTempDirectory("graft-jsonl-gzout").toString
    Jsonl.write(docs, out, shards = 2, compression = Some("gzip"))
    val walk = Files.walk(java.nio.file.Paths.get(out))
    val sawGz =
      try walk.iterator().asScala.exists(_.toString.endsWith(".gz"))
      finally walk.close()
    assert(sawGz, "no .gz part files written")
    val back = Jsonl.read(spark, s"$out/shard=*")
    assert(back.where(col("_corrupt_line").isNotNull).count() == 0)
    assert(back.count() == docs.count())
  }

  test("gzip landing files (.jsonl.gz) read transparently, quarantine intact") {
    val dir = Files.createTempDirectory("graft-jsonl-gz")
    val lines =
      """{"doc_id": 1, "text": "zipped", "lang": "en", "source": "web", "n_chars": 6}""" +
        "\n" + """garbage"""
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("part-0.jsonl.gz")))
    gz.write(lines.getBytes("UTF-8")); gz.close()
    val (clean, bad) = Jsonl.readQuarantined(spark, dir.toString)
    assert(clean.count() == 1 && bad.count() == 1)
    assert(clean.head().getAs[String]("text") == "zipped")
  }

  test("schema drift: parseable lines with missing fields stay clean, as nulls") {
    val dir = Files.createTempDirectory("graft-jsonl-drift")
    Files.write(dir.resolve("part-0.jsonl"),
      """{"doc_id": 7, "text": "no lang field"}""".getBytes("UTF-8"))
    val (clean, bad) = Jsonl.readQuarantined(spark, dir.toString)
    assert(bad.count() == 0)
    val r = clean.head()
    assert(r.getAs[Long]("doc_id") == 7L && r.isNullAt(r.fieldIndex("lang")))
  }
}
