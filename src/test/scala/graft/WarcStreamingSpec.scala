package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** Micro-batch WARC ingestion: newly-arrived shards per batch,
  * checkpointed offsets across restarts, value identity with the batch
  * read, loud monotone-name contract violation. */
class WarcStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(ids: Range) = ids.map { i =>
    (f"00000000-0000-4000-8000-$i%012d", s"http://corpus.local/doc/$i",
      "2026-01-01T00:00:00Z", s"doc number $i body")
  }.toDF("record_id", "target_uri", "warc_date", "content")

  /** One shard file with a monotonically increasing name. */
  private def shard(dir: String, seq: Int, ids: Range): Unit = {
    val tmp = Files.createTempDirectory("graft-warcstream-tmp").toString
    Warc.writeFixture(docs(ids), tmp, shards = 1, gzip = true)
    val src = new java.io.File(tmp).listFiles().head
    java.nio.file.Files.move(src.toPath,
      java.nio.file.Paths.get(dir, f"shard-$seq%05d.warc.gz"))
  }

  private def drainOnce(dir: String, out: String, ckpt: String,
      readOpts: Map[String, String] = Map.empty): Unit = {
    val q = spark.readStream.format("graft-warc").options(readOpts).load(s"$dir")
      .where($"warc_type" =!= "_corrupt")
      .select("record_id", "target_uri", "content")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive, "stream did not drain in time")
  }

  test("each micro-batch ingests only newly-arrived shards; offsets survive restart; values match batch") {
    val dir = Files.createTempDirectory("graft-warcstream").toString
    val out = Files.createTempDirectory("graft-warcstream-out").toString + "/p"
    val ckpt = Files.createTempDirectory("graft-warcstream-ck").toString

    shard(dir, 0, 0 until 4)
    drainOnce(dir, out, ckpt)
    val after1 = spark.read.parquet(out)
    assert(after1.count() == 4)

    // new shards arrive; a RESTARTED stream (same checkpoint) must
    // ingest only them — the parquet sink would duplicate rows if the
    // committed offset were not honored
    shard(dir, 1, 4 until 9)
    shard(dir, 2, 9 until 12)
    drainOnce(dir, out, ckpt)
    val all = spark.read.parquet(out)
    assert(all.count() == 12, s"expected 12 rows, got ${all.count()}")
    // value identity with the batch read over the same shards
    val batch = spark.read.format("graft-warc").load(dir)
      .where($"warc_type" =!= "_corrupt")
      .select("record_id", "target_uri", "content")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(key(all) == key(batch))
    // nothing new: a third drain appends nothing
    drainOnce(dir, out, ckpt)
    assert(spark.read.parquet(out).count() == 12)
  }

  test("unordered arrival mode: a ledger-bounded offset ingests out-of-order shard names exactly once") {
    // VERDICT r15 next #5: the monotone-name contract is the right
    // default, but a non-monotone layout must be USABLE — the bounded
    // (path, mtime) ledger in the offset processes late names instead
    // of failing, stays exactly-once across restarts, and its size is
    // arrival-window-bounded, not corpus-bounded.
    val dir = Files.createTempDirectory("graft-warcstream-uo").toString
    val out = Files.createTempDirectory("graft-warcstream-uo-out").toString + "/p"
    val ckpt = Files.createTempDirectory("graft-warcstream-uo-ck").toString
    def drainUnordered(): Unit = {
      val q = spark.readStream.format("graft-warc")
        .option("arrival", "unordered")
        .load(s"$dir")
        .where($"warc_type" =!= "_corrupt")
        .select("record_id", "target_uri", "content")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive, "stream did not drain in time")
    }
    // HIGH name first...
    shard(dir, 7, 0 until 3)
    drainUnordered()
    assert(spark.read.parquet(out).count() == 3)
    // ...then names sorting BELOW the previous batch — the exact shape
    // the monotone contract rejects — plus one above
    Thread.sleep(20)
    shard(dir, 2, 3 until 8)
    shard(dir, 9, 8 until 10)
    drainUnordered()
    assert(spark.read.parquet(out).count() == 10,
      "out-of-order shard names were not ingested")
    // idempotent: nothing new, nothing duplicated
    drainUnordered()
    assert(spark.read.parquet(out).count() == 10)
    // value identity with the batch read
    val batch = spark.read.format("graft-warc").load(dir)
      .where($"warc_type" =!= "_corrupt")
      .select("record_id", "target_uri", "content")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(key(spark.read.parquet(out)) == key(batch))
  }

  test("unordered mode: a watermark jump across a poll gap does not skip files that arrived on time") {
    // Review finding (r16): admission was judged against the NEW
    // watermark (newest mtime minus expiry), so a poll gap longer than
    // the expiry window silently dropped files that landed in between.
    // Admission is now judged against the PREVIOUS poll's watermark.
    // Shape: tiny expiry (80 ms); drain; shard A lands; a PAUSE longer
    // than the expiry; shard B lands (newest jumps, new wm passes A's
    // mtime); drain — A must still be ingested.
    val dir = Files.createTempDirectory("graft-warcstream-gap").toString
    val out = Files.createTempDirectory("graft-warcstream-gap-out").toString + "/p"
    val ckpt = Files.createTempDirectory("graft-warcstream-gap-ck").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-warc")
        .option("arrival", "unordered")
        .option("ledgerExpiryMs", "80")
        .load(s"$dir")
        .where($"warc_type" =!= "_corrupt")
        .select("record_id", "target_uri", "content")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    shard(dir, 0, 0 until 2)
    drain()
    assert(spark.read.parquet(out).count() == 2)
    shard(dir, 3, 2 until 5) // shard A
    Thread.sleep(300)        // >> expiry: the next poll's wm passes A
    shard(dir, 7, 5 until 6) // shard B (newest)
    drain()
    assert(spark.read.parquet(out).count() == 6,
      "a file arriving within the poll gap was skipped by the watermark jump")
    // and nothing duplicates on a further drain
    drain()
    assert(spark.read.parquet(out).count() == 6)
  }

  test("a shard arriving BELOW the committed offset violates the monotone-name contract loudly") {
    val dir = Files.createTempDirectory("graft-warcstream-late").toString
    val out = Files.createTempDirectory("graft-warcstream-late-out").toString + "/p"
    val ckpt = Files.createTempDirectory("graft-warcstream-late-ck").toString
    // skew tolerance pinned to 0: this fixture's "late" arrival is
    // 50 ms after the plan, inside the default 10 s allowance for real
    // deployments' fs-vs-driver clock skew (ADVICE r16 #2) — the spec
    // tests the detector, not the allowance
    val opts = Map("clockSkewToleranceMs" -> "0")
    shard(dir, 5, 0 until 3)
    drainOnce(dir, out, ckpt, opts)
    assert(spark.read.parquet(out).count() == 3)
    // late arrival: sorts below shard-00005 AND is younger than the
    // commit — would be skipped silently forever without the check
    Thread.sleep(50)
    shard(dir, 1, 3 until 6)
    shard(dir, 9, 6 until 8) // plus a legitimate new one
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainOnce(dir, out, ckpt, opts)
    }
    assert(String.valueOf(e.getCause).contains("monotone-shard-name"),
      String.valueOf(e.getCause).take(500))
  }

  test("clock-skew tolerance: a below-offset mtime within the allowance does not kill a healthy stream") {
    // ADVICE r16 #2: the late-arrival reference is driver wall-clock
    // but the evidence is shard-fs mtimes — storage whose clock runs
    // ahead of the driver makes a normally-ingested shard read as
    // "younger than the plan" and the require() killed a healthy
    // stream. With the default tolerance the same fixture keeps
    // draining: the below-offset file is (correctly, silently) treated
    // as pre-plan history per the monotone contract's documented
    // bound, and genuinely new shards keep flowing.
    val dir = Files.createTempDirectory("graft-warcstream-skew").toString
    val out = Files.createTempDirectory("graft-warcstream-skew-out").toString + "/p"
    val ckpt = Files.createTempDirectory("graft-warcstream-skew-ck").toString
    shard(dir, 5, 0 until 3)
    drainOnce(dir, out, ckpt)
    assert(spark.read.parquet(out).count() == 3)
    Thread.sleep(50)
    shard(dir, 1, 3 until 6) // mtime ~50 ms past the plan = "skewed fs clock"
    shard(dir, 9, 6 until 8)
    drainOnce(dir, out, ckpt) // default 10 s tolerance: no kill
    // the new shard ingested; the below-offset one is skipped per the
    // monotone contract (use arrival=unordered for layouts that do this)
    assert(spark.read.parquet(out).count() == 5)
  }
}
