package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 WARC source (`spark.read.format("graft-warc")`) — the
 * Catalyst-integrated sibling of [[Warc.read]]:
 *
 *  - **column pruning reaches the parse**: Catalyst pushes the
 *    required schema into the scan (`SupportsPushDownRequiredColumns`),
 *    and when `content` is not required the reader SKIPS every record
 *    block unread — no byte-array allocation, no UTF-8 decode, no
 *    string carried through the plan. A metadata query
 *    (`SELECT target_uri, content_len FROM warc`) over a 100 TB crawl
 *    pays gunzip + framing only; `.explain` shows the pruned
 *    ReadSchema, exactly like a parquet scan. The parquet economics
 *    apply to corruption too: invalid-UTF-8 content quarantines only
 *    when the content column is read (framing/gzip corruption always
 *    quarantines).
 *  - **SQL-registerable**: `CREATE TABLE ... USING graft-warc` /
 *    `spark.read.format("graft-warc").load(glob)` — the RDD facade
 *    cannot be referenced from plain SQL.
 *  - same parallelism grain (one partition per shard file — the
 *    Common Crawl layout's point), same streaming member-by-member
 *    decode, same quarantine contract, via the SAME parser
 *    ([[Warc.fileRows]]) — the two entry points cannot drift.
 *
 * Readers close their stream on exhaustion AND on early termination
 * (Spark calls `PartitionReader.close` on limit/take).
 */
class WarcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Warc.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(WarcSource.pathsOf(properties))
}

private[sources] object WarcSource {
  /** `load(p)` passes "path"; `load(p1, p2, ...)` passes "paths" as a
    * JSON string array (driver-authored, simple escapes only). */
  def pathsOf(properties: util.Map[String, String]): Seq[String] = {
    val single = Option(properties.get("path")).toSeq
    val multi = Option(properties.get("paths")).toSeq.flatMap { js =>
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(js)
        .map(_.group(1).replace("\\\\", "\\").replace("\\\"", "\"")).toSeq
    }
    val all = single ++ multi
    require(all.nonEmpty, "graft-warc: no path given — .load(<glob>)")
    all
  }

  /** Expand globs and directories to the shard FILE list — directories
    * RECURSIVELY (crawl layouts nest shards under segment dirs), hidden
    * files skipped, like any file source. Driver-side metadata. Zero
    * resolved files FAILS LOUDLY in batch mode: a nested layout that
    * silently resolved to an empty scan would read as an empty crawl
    * (`allowEmpty` for streaming, where an empty dir just means no
    * shards have arrived yet). */
  def resolveFiles(paths: Seq[String], conf: Configuration,
      allowEmpty: Boolean = false): Seq[String] =
    resolveFileStatuses(paths, conf, allowEmpty).map(_._1)

  /** Like [[resolveFiles]] but keeps each shard's mtime from the SAME
    * listing — the streaming ledger mode needs (path, mtime) pairs and
    * a per-file getFileStatus on top of the listing would be one
    * redundant RPC per shard per poll. */
  def resolveFileStatuses(paths: Seq[String], conf: Configuration,
      allowEmpty: Boolean = false): Seq[(String, Long)] = {
    val files = paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil)
      def hidden(rel: String): Boolean =
        rel.split('/').exists(n => n.startsWith("_") || n.startsWith("."))
      matched.flatMap { st =>
        if (!st.isDirectory) {
          if (hidden(st.getPath.getName)) Nil
          else Seq((st.getPath.toString, st.getModificationTime))
        } else {
          // hidden components are judged BELOW the matched root only —
          // a dot-dir ancestor the user explicitly pointed at is theirs
          val rootStr = st.getPath.toString
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
          val it = fs.listFiles(st.getPath, true)
          while (it.hasNext) {
            val f = it.next()
            val name = f.getPath.toString
            if (!hidden(name.stripPrefix(rootStr).stripPrefix("/")))
              out += ((name, f.getModificationTime))
          }
          out
        }
      }
    }.distinctBy(_._1).sortBy(_._1)
    require(allowEmpty || files.nonEmpty,
      s"graft-warc: ${paths.mkString(",")} resolved to ZERO shard files" +
        " — wrong glob or empty crawl (an empty scan here would silently" +
        " read as an empty corpus)")
    files
  }
}

/** Hadoop Configuration is not Serializable (it is Writable); the
  * factory ships it to executors via its Writable form. */
private[sources] class SerializableHadoopConf(@transient var conf: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

private[sources] class WarcTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-warc ${paths.mkString(",")}"
  override def schema(): StructType = Warc.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths,
      options.getOrDefault("arrival", "monotone"),
      options.getLong("ledgerExpiryMs", 3600000L),
      options.getLong("clockSkewToleranceMs", 10000L),
      options.getInt("ledgerMaxEntries", 0))
}

private[sources] class WarcScanBuilder(paths: Seq[String],
    arrival: String, ledgerExpiryMs: Long,
    clockSkewToleranceMs: Long, ledgerMaxEntries: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = Warc.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new WarcScan(paths, required, arrival, ledgerExpiryMs,
      clockSkewToleranceMs, ledgerMaxEntries)
}

private[sources] class WarcScan(paths: Seq[String], required: StructType,
    arrival: String = "monotone", ledgerExpiryMs: Long = 3600000L,
    clockSkewToleranceMs: Long = 10000L, ledgerMaxEntries: Int = 0)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(paths, required, checkpointLocation,
      arrival, ledgerExpiryMs, clockSkewToleranceMs, ledgerMaxEntries)
  override def description(): String =
    s"graft-warc ${paths.mkString(",")} (columns: ${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    WarcSource.resolveFiles(paths, conf)
      .map(f => WarcInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    new WarcReaderFactory(conf, required)
  }
}

private[sources] case class WarcInputPartition(file: String) extends InputPartition

private[sources] class WarcReaderFactory(conf: SerializableHadoopConf,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcInputPartition].file, conf.conf, required)
}

private[sources] class WarcPartitionReader(file: String, conf: Configuration,
    required: StructType) extends PartitionReader[InternalRow] {
  // full-schema field index per required column; strings convert to
  // UTF8String, content_len stays long
  private val idx: Array[Int] = required.fieldNames.map(Warc.schema.fieldIndex)
  private val withContent = required.fieldNames.contains("content")
  private val rows = Warc.fileRows(file, () => {
    val p = new Path(file)
    p.getFileSystem(conf).open(p)
  }, Warc.codecOf(file), withContent)
  private var cur: InternalRow = _

  override def next(): Boolean =
    if (!rows.hasNext) false
    else {
      val r = rows.next()
      val vals = new Array[Any](idx.length)
      var i = 0
      while (i < idx.length) {
        vals(i) = r.get(idx(i)) match {
          case null => null
          case s: String => UTF8String.fromString(s)
          case other => other // content_len: Long
        }
        i += 1
      }
      cur = new GenericInternalRow(vals)
      true
    }

  override def get(): InternalRow = cur

  override def close(): Unit =
    // fileRows closes on exhaustion/corruption; this covers EARLY
    // termination (limit/take), releasing a mid-member Inflater's
    // native state too (the iterator closes its gzip wrapper)
    rows.close()
}
