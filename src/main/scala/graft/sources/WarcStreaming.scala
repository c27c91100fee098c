package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/**
 * Micro-batch WARC ingestion (`spark.readStream.format("graft-warc")`)
 * — the arrival story of a live crawl: shard files keep landing in a
 * directory, each micro-batch processes the newly-arrived ones, and
 * the whole downstream pipeline (extract -> quality -> dedup-on-ingest
 * -> store) rides Structured Streaming's checkpoint/recovery.
 *
 * TWO ARRIVAL MODES (`.option("arrival", ...)`):
 *
 * `monotone` (default) — the offset is the lexicographically LARGEST
 * shard path processed so far; a batch is `(start, end]` in
 * sorted-path order. This requires shard names to arrive in
 * non-decreasing sort order — exactly how crawl outputs are written in
 * practice (Common Crawl shards carry zero-padded segment / sequence
 * numbers; our own writers emit `%05d`-padded names). A file that
 * arrives sorting BELOW the committed offset is a contract violation
 * and is detected loudly at the next batch plan (it would otherwise be
 * skipped silently — a missing-data bug, not a crash). One string of
 * state per checkpoint; nothing grows with shard count.
 *
 * `unordered` — a bounded seen-files LEDGER rides in the offset
 * (VERDICT r15 next #5: a non-monotone layout must be USABLE, not just
 * detected): each offset carries the (path, mtime) of files observed
 * within the expiry window plus a watermark; a batch is exactly
 * `end.seen -- start.seen` — pure offset arithmetic, deterministic on
 * checkpoint replay with no re-listing. Entries expire once their
 * mtime falls `ledgerExpiryMs` (default 1 h) behind the newest
 * observed mtime, so the ledger is bounded by arrival-rate x expiry,
 * not corpus size. The documented bound: a file arriving with an
 * mtime older than the watermark (arrival lateness beyond the expiry
 * window) is skipped — size `ledgerExpiryMs` above the layout's
 * worst-case arrival lateness. Crawl shards are immutable once
 * written (a rewritten mtime would re-ingest).
 *
 * Why not re-implement FileStreamSource's seen-files map: that map is
 * unbounded driver state at crawl scale (millions of shards); the
 * monotone mode needs one string, the unordered mode a window-bounded
 * ledger with an explicit, loud expiry contract.
 */
private[sources] class WarcMicroBatchStream(paths: Seq[String],
    required: StructType, checkpointLocation: String,
    arrival: String = "monotone",
    ledgerExpiryMs: Long = 3600000L,
    clockSkewToleranceMs: Long = 10000L,
    ledgerMaxEntries: Int = 0) extends MicroBatchStream {

  require(arrival == "monotone" || arrival == "unordered",
    s"graft-warc: arrival mode '$arrival' (use 'monotone' or 'unordered')")

  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  private def listFiles(): Seq[String] =
    WarcSource.resolveFiles(paths, conf.conf, allowEmpty = true)

  private def mtimeOf(f: String): Option[Long] =
    try {
      val p = new org.apache.hadoop.fs.Path(f)
      Some(p.getFileSystem(conf.conf).getFileStatus(p).getModificationTime)
    } catch { case e: java.io.IOException =>
      // a swallowed status failure must not be SILENT (ADVICE r15 #3:
      // 'not late' by IOException hid the check's blind spots)
      System.err.println(s"WARN graft-warc stream: status read failed for $f" +
        s" ($e) — excluded from late-arrival evidence this plan")
      None
    }

  override def initialOffset(): Offset =
    if (arrival == "unordered") WarcLedgerOffset(-1L, Nil)
    else WarcStreamOffset("")

  /** Last monotone offset this stream produced or deserialized — plan
    * times must be REUSED while the file list is unchanged: a fresh
    * planMs stamp per poll would make every latestOffset() unequal to
    * the committed one and drive endless empty batches. */
  @volatile private var lastMono: WarcStreamOffset = null

  override def latestOffset(): Offset =
    if (arrival == "unordered") latestLedger()
    else {
      val fs = listFiles()
      val last = if (fs.isEmpty) "" else fs.max
      if (lastMono != null && lastMono.last == last) lastMono
      else {
        lastMono = WarcStreamOffset(last, System.currentTimeMillis())
        lastMono
      }
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    (if (arrival == "unordered") {
      val already = WarcLedgerOffset.of(start).seen.map(_._1).toSet
      WarcLedgerOffset.of(end).seen.map(_._1).filterNot(already)
    }
    else planMonotone(WarcStreamOffset.of(start), WarcStreamOffset.of(end)))
      .map(f => WarcInputPartition(f): InputPartition).toArray

  // ---- monotone mode ----

  /** When planInputPartitions LAST ran for a batch ending at a given
    * offset: the batch's file list is fixed by THAT re-listing, so a
    * file landing between latestOffset()'s stamp and the partition
    * plan is still INCLUDED in the batch — judging it by the (earlier)
    * offset stamp would kill the stream over a file that was in fact
    * ingested. In-memory only: after a restart the offset's own plan
    * stamp is the (slightly earlier, conservative) fallback. */
  @volatile private var lastPlanExec: (String, Long) = ("", 0L)

  private def planMonotone(s: WarcStreamOffset, e: WarcStreamOffset): Seq[String] = {
    // captured BEFORE the listing: a file landing mid-listing may or
    // may not be in `all`, and with the stamp taken after it would
    // read as "before this plan" and could skip silently; stamping
    // first errs toward a loud false positive in a ms-wide window
    val planExecAt = System.currentTimeMillis()
    val all = listFiles()
    // loud contract check: a shard sorting below a COMMITTED offset
    // arrived out of order and would be skipped silently forever
    if (s.last.nonEmpty) {
      val late = all.filter(_ < s.last)
      // the files at/below `s` that were processed are indistinguishable
      // from violators by name alone; a STRICT count check would need
      // the seen-set this mode avoids. What IS detectable: nothing
      // below `s` may be YOUNGER than the point the batch ENDING at `s`
      // fixed its file list — crawl shards are immutable once written,
      // so a late mtime means a late arrival. Reference precedence:
      // the in-memory partition-PLAN time of that batch (exact),
      // else the offset's own latestOffset stamp (rides in the
      // checkpoint as `plan_ms`; conservative by the stamp-to-plan
      // gap — ADVICE r15 #3), else the commit-log mtime (pre-field
      // checkpoints). A MISSING reference disables the check LOUDLY,
      // not silently.
      val refMs =
        if (lastPlanExec._1 == s.last && lastPlanExec._2 > 0) lastPlanExec._2
        else if (s.planMs > 0) s.planMs
        else commitTimeMs()
      if (refMs > 0) {
        // the reference is DRIVER wall-clock but the evidence is shard
        // filesystem MTIMES — different clock domains (ADVICE r16 #2:
        // an fs clock ahead of the driver makes a normally-ingested
        // shard read as late and kills a healthy stream). Bridge it by
        // MEASURING the offset in the fs's own domain (write-and-stat
        // a probe in the checkpoint dir when it lives on the same
        // filesystem service as the shards) plus a configurable
        // tolerance (`.option("clockSkewToleranceMs", ...)`, default
        // 10 s) for jitter/granularity. A genuine violation within the
        // tolerance is masked — the documented trade for not killing
        // healthy streams on skewed storage; size the tolerance to the
        // deployment's NTP discipline. Probed only on this (rare)
        // below-offset-files path, never per poll.
        val allowMs = refMs + fsClockOffsetMs() + clockSkewToleranceMs
        val lateArrivals = late.filter(f => mtimeOf(f).exists(_ > allowMs))
        require(lateArrivals.isEmpty,
          s"graft-warc stream: ${lateArrivals.size} shard(s) arrived sorting BELOW the " +
            s"committed offset '${s.last}' (e.g. ${lateArrivals.take(3).mkString(", ")}) — " +
            "the monotone-shard-name contract is violated and these files would be " +
            "skipped silently; reprocess with a fresh checkpoint, rename the shards, " +
            "or use .option(\"arrival\", \"unordered\")")
      } else if (late.nonEmpty)
        System.err.println("WARN graft-warc stream: no plan-time or commit-log " +
          s"reference available — cannot verify ${late.size} file(s) sorting below " +
          s"the committed offset '${s.last}' against the monotone-name contract")
    }
    // this batch's file list is fixed by the listing above — record
    // the (pre-listing) instant for the next plan's late reference
    lastPlanExec = (e.last, planExecAt)
    all.filter(f => f > s.last && f <= e.last)
  }

  /** Measured (shard-filesystem clock − driver clock) in ms, from a
    * write-and-stat probe under the checkpoint dir — valid when the
    * checkpoint and the inputs resolve to the SAME FileSystem service
    * (equal URIs), which is the common deployment (one object store /
    * one HDFS). Different services, or any I/O failure, return 0: the
    * skew tolerance alone absorbs small residual skews then. */
  private def fsClockOffsetMs(): Long =
    try {
      val in = new org.apache.hadoop.fs.Path(paths.head)
      val ck = new org.apache.hadoop.fs.Path(checkpointLocation)
      val inFs = in.getFileSystem(conf.conf)
      val ckFs = ck.getFileSystem(conf.conf)
      if (inFs.getUri != ckFs.getUri) 0L
      else {
        val probe = new org.apache.hadoop.fs.Path(ck, "_graft_clock_probe")
        val t0 = System.currentTimeMillis()
        ckFs.create(probe, true).close()
        val t1 = System.currentTimeMillis()
        val m = ckFs.getFileStatus(probe).getModificationTime
        try ckFs.delete(probe, false)
        catch { case _: java.io.IOException => () }
        m - (t0 + t1) / 2
      }
    } catch { case _: java.io.IOException => 0L }

  /** mtime of the newest commit in the checkpoint's commit log — the
    * FALLBACK reference for late-arrival detection when the start
    * offset predates the plan-time field. 0 when unknown. The engine
    * hands the SOURCE's checkpoint subdir (`<root>/sources/<i>`) to
    * toMicroBatchStream, so walk up to the root that owns `commits/`. */
  private def commitTimeMs(): Long =
    try {
      val start = new org.apache.hadoop.fs.Path(checkpointLocation)
      val fs = start.getFileSystem(conf.conf)
      Iterator.iterate(start)(_.getParent).takeWhile(_ != null).take(4)
        .map(d => new org.apache.hadoop.fs.Path(d, "commits"))
        .find(fs.exists)
        .map(p => fs.listStatus(p).map(_.getModificationTime).foldLeft(0L)(math.max))
        .getOrElse(0L)
    } catch { case _: java.io.IOException => 0L }

  // ---- unordered (ledger) mode ----

  /** The newest ledger this stream object has seen: seeded from the
    * checkpoint via [[deserializeOffset]] on restart, advanced by each
    * [[latestOffset]]. Only the watermark + membership feed forward —
    * batch CONTENT is always end-minus-start offset arithmetic. */
  @volatile private var lastLedger: WarcLedgerOffset = WarcLedgerOffset(-1L, Nil)

  private def remember(l: WarcLedgerOffset): WarcLedgerOffset = {
    if (l.watermark > lastLedger.watermark ||
        (l.watermark == lastLedger.watermark && l.seen.size > lastLedger.seen.size))
      lastLedger = l
    l
  }

  /** Names already warned as beyond-window, so the (unavoidable)
    * ambiguity between "processed long ago, ledger entry expired" and
    * "genuinely lost" is logged ONCE per file per stream object, not
    * per poll. Bounded: oldest half evicted past 100k entries. */
  private val warnedBeyond = new java.util.LinkedHashSet[String]()

  private def latestLedger(): WarcLedgerOffset = {
    val prev = lastLedger
    // mtimes come from the SAME listing (no per-file status RPCs)
    val files = WarcSource.resolveFileStatuses(paths, conf.conf, allowEmpty = true)
    val newest = files.map(_._2).maxOption.getOrElse(prev.watermark)
    // Admission is judged against the PREVIOUS watermark: a poll gap
    // longer than the expiry window must not skip files that arrived
    // on time in between (the new watermark can jump newest-expiry in
    // one step; files with mtime between the old and new watermark
    // were never given a chance to be seen). First listing (watermark
    // -1): ALL existing files are history and enter regardless of age.
    val prevSeen = prev.seen.map(_._1).toSet
    val fresh = files.filter { case (f, m) =>
      !prevSeen(f) && (prev.watermark < 0 || m >= prev.watermark)
    }
    // below the PREVIOUS watermark and unknown: either lost (arrival
    // lateness beyond the expiry window) or processed so long ago the
    // ledger entry expired — indistinguishable by design; warn once
    val beyond = if (prev.watermark < 0) Nil
      else files.filter { case (f, m) =>
        !prevSeen(f) && m < prev.watermark && !warnedBeyond.contains(f)
      }
    if (beyond.nonEmpty) {
      beyond.foreach(b => warnedBeyond.add(b._1))
      if (warnedBeyond.size > 100000) {
        val it = warnedBeyond.iterator()
        var drop = warnedBeyond.size / 2
        while (drop > 0 && it.hasNext) { it.next(); it.remove(); drop -= 1 }
      }
      System.err.println(s"WARN graft-warc stream: ${beyond.size} shard(s) sort " +
        s"below the ledger watermark and are NOT ingested " +
        s"(e.g. ${beyond.take(3).map(_._1).mkString(", ")}) — either already " +
        "processed with the ledger entry since expired, or arrived later than " +
        s"the ${ledgerExpiryMs} ms expiry window allows; raise " +
        ".option(\"ledgerExpiryMs\", ...) above the layout's worst-case lateness")
    }
    // the watermark advances AFTER admission; entries it has passed
    // expire (admitted files are floored to the watermark so they
    // survive until the NEXT advance)
    val wm = math.max(prev.watermark, newest - ledgerExpiryMs)
    val kept = prev.seen.filter(_._2 >= wm)
    val admitted = fresh.map { case (f, m) => (f, math.max(m, wm)) }
    val next = WarcLedgerOffset(wm, (kept ++ admitted).sortBy(_._1))
    // the ledger rides in EVERY offset-log entry, so pathological
    // growth (arrival rate x expiry window) is driver memory plus
    // write amplification on every batch (ADVICE r16 #5) — warn loudly
    // past a fixed threshold, and fail the stream past the explicit
    // `.option("ledgerMaxEntries", n)` bound when the operator set one
    if (ledgerMaxEntries > 0 && next.seen.size > ledgerMaxEntries)
      throw new IllegalStateException(
        s"graft-warc stream: seen-files ledger holds ${next.seen.size} " +
          s"entries > ledgerMaxEntries=$ledgerMaxEntries — the arrival " +
          s"rate x ${ledgerExpiryMs} ms expiry window exceeds the " +
          "configured offset-state bound; lower ledgerExpiryMs, raise " +
          "ledgerMaxEntries, or switch to monotone shard naming")
    if (next.seen.size > LedgerWarnEntries && !ledgerSizeWarned) {
      ledgerSizeWarned = true
      System.err.println(s"WARN graft-warc stream: seen-files ledger " +
        s"holds ${next.seen.size} entries (> $LedgerWarnEntries) — every " +
        "offset-log entry carries the full ledger, so offsets are " +
        "getting large; lower .option(\"ledgerExpiryMs\", ...) toward " +
        "the layout's real arrival lateness or bound it with " +
        ".option(\"ledgerMaxEntries\", ...)")
    }
    remember(next)
  }

  private val LedgerWarnEntries = 50000
  @volatile private var ledgerSizeWarned = false

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(conf, required)

  override def deserializeOffset(json: String): Offset =
    if (arrival == "unordered") remember(WarcLedgerOffset.fromJson(json))
    else {
      val o = WarcStreamOffset.fromJson(json)
      // seed the plan-time memory from the checkpoint on restart, so a
      // restarted stream keeps its late-arrival reference
      if (lastMono == null || lastMono.last <= o.last) lastMono = o
      o
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Monotone-mode state: the largest processed shard path, plus the
  * wall-clock instant this offset was PLANNED (the late-arrival
  * reference; 0 in offsets checkpointed before the field existed). */
private[sources] case class WarcStreamOffset(last: String, planMs: Long = 0L)
    extends Offset {
  override def json(): String =
    s"""{"last":"${last.replace("\\", "\\\\").replace("\"", "\\\"")}","plan_ms":$planMs}"""
}

private[sources] object WarcStreamOffset {
  def of(o: Offset): WarcStreamOffset = o match {
    case w: WarcStreamOffset => w
    case other => fromJson(other.json())
  }
  def fromJson(js: String): WarcStreamOffset = {
    val m = "\"last\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(js)
      .getOrElse(throw new IllegalArgumentException(
        s"graft-warc stream: malformed offset json '$js'"))
    val plan = "\"plan_ms\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(js)
      .map(_.group(1).toLong).getOrElse(0L)
    WarcStreamOffset(m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"), plan)
  }
}

/** Unordered-mode state: watermark + the (path, mtime) ledger of files
  * observed within the expiry window. Bounded by arrival-rate x
  * expiry; batch content is pure end-minus-start set arithmetic. */
private[sources] case class WarcLedgerOffset(watermark: Long,
    seen: Seq[(String, Long)]) extends Offset {
  private def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
  override def json(): String =
    s"""{"watermark":$watermark,"seen":[""" +
      seen.map { case (f, m) => s"""["${esc(f)}",$m]""" }.mkString(",") + "]}"
}

private[sources] object WarcLedgerOffset {
  def of(o: Offset): WarcLedgerOffset = o match {
    case w: WarcLedgerOffset => w
    case other => fromJson(other.json())
  }
  def fromJson(js: String): WarcLedgerOffset = {
    val wm = "\"watermark\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(js)
      .getOrElse(throw new IllegalArgumentException(
        s"graft-warc stream: malformed ledger offset json '${js.take(200)}'"))
      .group(1).toLong
    val seen = "\\[\"((?:[^\"\\\\]|\\\\.)*)\",(\\d+)\\]".r.findAllMatchIn(js)
      .map(m => (m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"),
        m.group(2).toLong)).toSeq
    WarcLedgerOffset(wm, seen)
  }
}
