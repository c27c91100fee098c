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
 * OFFSET CONTRACT (documented, not guessed): the offset is the
 * lexicographically LARGEST shard path processed so far; a batch is
 * `(start, end]` in sorted-path order. This requires shard names to
 * arrive in non-decreasing sort order — exactly how crawl outputs are
 * written in practice (Common Crawl shards carry zero-padded segment /
 * sequence numbers; our own writers emit `%05d`-padded names). A file
 * that arrives sorting BELOW the committed offset is a contract
 * violation and is detected loudly at the next batch plan (it would
 * otherwise be skipped silently — a missing-data bug, not a crash).
 *
 * Why not re-implement FileStreamSource's seen-files map: that map is
 * unbounded driver state at crawl scale (millions of shards) and
 * exists to support arbitrary arrival order, which crawl layouts do
 * not need. One string of state per checkpoint beats a persisted set.
 */
private[sources] class WarcMicroBatchStream(paths: Seq[String],
    required: StructType, checkpointLocation: String) extends MicroBatchStream {

  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  private def listFiles(): Seq[String] =
    WarcSource.resolveFiles(paths, conf.conf, allowEmpty = true)

  override def initialOffset(): Offset = WarcStreamOffset("")

  override def latestOffset(): Offset = {
    val fs = listFiles()
    WarcStreamOffset(if (fs.isEmpty) "" else fs.max)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = WarcStreamOffset.of(start).last
    val e = WarcStreamOffset.of(end).last
    val all = listFiles()
    // loud contract check: a shard sorting below a COMMITTED offset
    // arrived out of order and would be skipped silently forever
    if (s.nonEmpty) {
      val late = all.filter(_ < s)
      // the files at/below `s` that were processed are indistinguishable
      // from violators by name alone; a STRICT count check would need
      // the seen-set this design avoids. What IS detectable: nothing
      // below `s` may be YOUNGER than the checkpoint's commit — crawl
      // shards are immutable once written, so a late mtime means a
      // late arrival.
      val commitMs = commitTimeMs()
      if (commitMs > 0) {
        val lateArrivals = late.filter { f =>
          try {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(conf.conf).getFileStatus(p).getModificationTime > commitMs
          } catch { case _: java.io.IOException => false }
        }
        require(lateArrivals.isEmpty,
          s"graft-warc stream: ${lateArrivals.size} shard(s) arrived sorting BELOW the " +
            s"committed offset '$s' (e.g. ${lateArrivals.take(3).mkString(", ")}) — " +
            "the monotone-shard-name contract is violated and these files would be " +
            "skipped silently; reprocess with a fresh checkpoint or rename the shards")
      }
    }
    all.filter(f => f > s && f <= e)
      .map(f => WarcInputPartition(f): InputPartition).toArray
  }

  /** mtime of the newest commit in the checkpoint's commit log — the
    * reference point for late-arrival detection. 0 when unknown. The
    * engine hands the SOURCE's checkpoint subdir (`<root>/sources/<i>`)
    * to toMicroBatchStream, so walk up to the root that owns
    * `commits/`. */
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

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(conf, required)

  override def deserializeOffset(json: String): Offset =
    WarcStreamOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One string of state: the largest processed shard path. */
private[sources] case class WarcStreamOffset(last: String) extends Offset {
  override def json(): String =
    s"""{"last":"${last.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
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
    WarcStreamOffset(m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
  }
}
