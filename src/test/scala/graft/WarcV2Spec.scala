package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** DataSource V2 WARC source: value identity with the RDD facade,
  * column pruning reaching the parse (content blocks skipped unread),
  * SQL registration, quarantine parity, early-termination close. */
class WarcV2Spec extends AnyFunSuite {
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

  private lazy val gzDir: String = {
    val dir = Files.createTempDirectory("graft-warcv2").toString
    Warc.writeFixture(fixtureDf, dir, shards = 2, gzip = true)
    dir
  }

  private def v2(glob: String) = spark.read.format("graft-warc").load(glob)

  test("value identity with Warc.read across the full schema, gzip and plain") {
    for (gzip <- Seq(true, false)) {
      val dir = Files.createTempDirectory(s"graft-warcv2-$gzip").toString
      Warc.writeFixture(fixtureDf, dir, shards = 2, gzip = gzip)
      def key(r: org.apache.spark.sql.Row) = r.toSeq.map(String.valueOf).mkString("|")
      val a = v2(s"$dir/*").collect().map(key).sorted
      val b = Warc.read(spark, s"$dir/*").collect().map(key).sorted
      assert(a.sameElements(b) && a.length == 3)
    }
  }

  test("column pruning reaches the scan: required schema excludes content, values still exact") {
    val df = v2(s"$gzDir/*").select("target_uri", "content_len")
    val scanSchemas = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan.readSchema().fieldNames.toSeq
    }
    assert(scanSchemas.nonEmpty && scanSchemas.forall(s =>
      !s.contains("content") && s.contains("target_uri")),
      s"content not pruned from the scan: $scanSchemas")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = fixtureDf.collect().map(r => (r.getString(1),
      r.getString(3).getBytes(StandardCharsets.UTF_8).length.toLong)).toMap
    assert(got == want)
    // count(*): empty required schema, blocks skipped entirely
    assert(v2(s"$gzDir/*").count() == 3)
    // early termination closes the stream cleanly (PartitionReader.close)
    assert(v2(s"$gzDir/*").limit(1).collect().length == 1)
  }

  test("directory loads resolve shards RECURSIVELY; zero resolved files fails loudly") {
    // crawl layouts nest shards under segment dirs — a dir load that
    // silently resolved to zero partitions would read as an empty crawl
    val root = Files.createTempDirectory("graft-warcv2-nest").toString
    val seg = s"$root/segments/seg-00001"
    Warc.writeFixture(fixtureDf, seg, shards = 2, gzip = true)
    assert(v2(root).count() == 3)
    // hidden staging dirs below the root are skipped
    val staged = s"$root/_stage"
    Warc.writeFixture(fixtureDf, staged, shards = 1, gzip = true)
    assert(v2(root).count() == 3)
    // an empty resolution is an error, not an empty DataFrame
    val empty = Files.createTempDirectory("graft-warcv2-empty").toString
    val e = intercept[Exception](v2(empty).count())
    assert(String.valueOf(e.getMessage).contains("ZERO shard files")
      || String.valueOf(e.getCause).contains("ZERO shard files"), e.toString)
  }

  test("SQL registration: a temp view over the v2 source serves plain SQL") {
    v2(s"$gzDir/*").createOrReplaceTempView("warc_v2_t")
    val n = spark.sql(
      "SELECT count(*) AS n FROM warc_v2_t WHERE warc_type = 'response'")
      .head().getLong(0)
    assert(n == 3)
  }

  test("parquet economics for content corruption: invalid UTF-8 quarantines only when content is read") {
    val dir = Files.createTempDirectory("graft-warcv2-utf8").toString
    val good = Warc.renderRecord("response", "id-1", "http://x/1",
      "2026-01-01T00:00:00Z", "fine".getBytes(StandardCharsets.UTF_8))
    val badUtf8 = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:id-2>\r\nContent-Length: 3\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8) ++
      Array[Byte](0x61, -1, 0x62) ++ "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
    Files.write(java.nio.file.Paths.get(dir, "x.warc"), good ++ badUtf8)
    // content read: the invalid block quarantines (same as the facade)
    val full = v2(s"$dir/*").collect()
    assert(full.count(_.getString(0) == "_corrupt") == 1)
    assert(full.count(_.getString(0) == "response") == 1)
    // content pruned: the block is never decoded — both records are
    // plain metadata rows (framing corruption would still quarantine)
    val meta = v2(s"$dir/*").select("warc_type", "record_id", "content_len").collect()
    assert(meta.count(_.getString(0) == "response") == 2)
    assert(meta.count(_.getString(0) == "_corrupt") == 0)
    // gzip-layer corruption still quarantines even content-pruned
    val dir2 = Files.createTempDirectory("graft-warcv2-gz").toString
    Files.write(java.nio.file.Paths.get(dir2, "bad.warc.gz"),
      Warc.gzipMember(good) ++ "JUNK".getBytes(StandardCharsets.UTF_8))
    val metaGz = v2(s"$dir2/*").select("warc_type", "content_len").collect()
    assert(metaGz.count(_.getString(0) == "_corrupt") == 1)
    assert(metaGz.count(_.getString(0) == "response") == 1)
  }
}
