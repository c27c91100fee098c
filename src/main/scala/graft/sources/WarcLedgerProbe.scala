package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * Scale fragment for the unordered-arrival ledger (VERDICT r16 next
 * #7: the mode was spec-gated at fixture scale only — exercise it at
 * crawl-scale shard counts and record ledger size, offset JSON weight
 * and per-poll cost in the bench artifact).
 *
 * The probe drives [[WarcMicroBatchStream]]'s offset machinery
 * directly over a synthetic directory of empty shard files — the
 * ledger's cost is listing + offset arithmetic + offset-log weight,
 * none of which reads shard CONTENT, so empty files measure the real
 * thing at a fraction of the staging cost. Arrival order is
 * adversarial (reverse-sorted names across interleaved waves — the
 * exact layout monotone mode rejects), and the final wave advances the
 * watermark past the expiry window to exercise entry churn.
 */
object WarcLedgerProbe {

  def atScale(spark: SparkSession): String = {
    val nShards = 50000
    val dir = java.nio.file.Files.createTempDirectory("graft_ledger_scale")
    try {
      val names = (0 until nShards)
        .map(i => f"shard-${nShards - 1 - i}%07d.warc") // reverse-sorted arrival
      def create(ns: Seq[String]): Unit = ns.foreach { n =>
        java.nio.file.Files.createFile(dir.resolve(n)); ()
      }
      val stream = new WarcMicroBatchStream(Seq(s"$dir/*.warc"),
        Warc.schema, s"$dir/_ckpt", arrival = "unordered",
        ledgerExpiryMs = 3600000L)
      val start = stream.initialOffset()

      // wave 1: half the corpus lands (reverse order), one poll
      create(names.take(nShards / 2))
      val t1 = System.nanoTime()
      val off1 = stream.latestOffset()
      val poll1Ms = (System.nanoTime() - t1) / 1e6
      val led1 = WarcLedgerOffset.of(off1)
      val batch1 = stream.planInputPartitions(start, off1).length

      // wave 2: the rest (still adversarial), second poll
      create(names.drop(nShards / 2))
      val t2 = System.nanoTime()
      val off2 = stream.latestOffset()
      val poll2Ms = (System.nanoTime() - t2) / 1e6
      val led2 = WarcLedgerOffset.of(off2)
      val batch2 = stream.planInputPartitions(off1, off2).length
      val offsetJsonBytes = off2.json().length

      // expiry churn: a second stream instance with a tiny window
      // resumes from the full 50k-entry checkpoint offset (the restart
      // path), sleeps past the window and sees one fresh shard — the
      // watermark must jump and the ledger must shed the aged entries
      // instead of growing with corpus size
      val churn = new WarcMicroBatchStream(Seq(s"$dir/*.warc"),
        Warc.schema, s"$dir/_ckpt", arrival = "unordered",
        ledgerExpiryMs = 50L)
      churn.deserializeOffset(off2.json())
      Thread.sleep(150)
      create(Seq("shard-9999999.warc"))
      val t3 = System.nanoTime()
      val off3 = churn.latestOffset()
      val poll3Ms = (System.nanoTime() - t3) / 1e6
      val led3 = WarcLedgerOffset.of(off3)

      f"""{"shards":$nShards,"batch1":$batch1,"batch2":$batch2,""" +
        f""""ledger_wave1":${led1.seen.size},"ledger_max":${led2.seen.size},""" +
        f""""ledger_after_expiry":${led3.seen.size},""" +
        f""""offset_json_bytes":$offsetJsonBytes,""" +
        f""""poll1_ms":$poll1Ms%.1f,"poll2_ms":$poll2Ms%.1f,"poll3_ms":$poll3Ms%.1f}"""
    } finally {
      try {
        java.nio.file.Files.walk(dir)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
