package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * JSONL corpus ingestion/export — the interchange format a web-scale
 * text pipeline actually receives (scrape dumps, API exports) before
 * anything becomes parquet. The reference ingests via its typed API
 * only (reference src/db.rs:131-170 `insert`); at 100 TB the upstream
 * is JSONL shards, so the engine owns the boundary:
 *
 *  - schema is EXPLICIT, never inferred: inference reads the data
 *    twice and silently unions drifting shard schemas — at corpus
 *    scale both are bugs, not conveniences;
 *  - corrupt lines are QUARANTINED, not dropped and not fatal:
 *    PERMISSIVE mode routes unparseable lines to a corrupt-record
 *    column, [[readQuarantined]] splits them into (clean, quarantine)
 *    so a load is exact about what it rejected (count + raw line);
 *  - export is one JSON object per line via `to_json(struct(...))`,
 *    hash-sharded like the parquet export path (stable shard
 *    membership under re-runs).
 *
 * Everything is a plain DataFrame plan — the reader parallelizes by
 * file splits, the writer by partitions; no driver-side I/O.
 */
object Jsonl {

  /** The corpus interchange schema (matches the documents fixture). */
  val documentsSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")

  private val CorruptCol = "_corrupt_line"

  /** Read JSONL with an explicit schema; unparseable lines surface in
    * the `_corrupt_line` column (null for clean rows) instead of
    * killing the load or vanishing. Deliberately text + `from_json`
    * rather than the native json reader: Spark refuses a query that
    * references ONLY the corrupt column on raw files
    * (queryFromRawFilesIncludeCorruptRecordColumnError), which is
    * exactly the quarantine branch's shape — the per-row expression
    * has no such restriction and stays in codegen. Blank lines are
    * skipped (shard concatenation artifacts, not corruption). */
  def read(spark: SparkSession, path: String,
           schema: StructType = documentsSchema): DataFrame =
    parseLines(spark.read.text(path), schema)

  /** Streaming twin of [[read]] — a JSONL landing directory as a
    * Structured Streaming source (micro-batch file discovery), same
    * parse + quarantine semantics per line; composes with
    * `VectorStore.insertStream` / any writeStream sink. */
  def readStream(spark: SparkSession, path: String,
                 schema: StructType = documentsSchema): DataFrame =
    parseLines(spark.readStream.text(path), schema)

  private def parseLines(lines: DataFrame, schema: StructType): DataFrame = {
    val full = schema.add(CorruptCol, "string")
    lines
      .where(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
      .select(full.fieldNames.toIndexedSeq.map(f => col(s"r.`$f`")): _*)
  }

  /** (clean, quarantine): clean rows in the declared schema; the
    * quarantine carries the raw offending line for audit/repair. A
    * line that parses but misses fields is CLEAN with nulls (schema
    * drift is visible, not fatal); only unparseable JSON quarantines. */
  def readQuarantined(spark: SparkSession, path: String,
                      schema: StructType = documentsSchema): (DataFrame, DataFrame) = {
    // the two branches share the PLAN SUBTREE, not a materialized
    // scan: a caller acting on BOTH frames re-reads and re-parses the
    // files once per action — cache `read(...)` first (or persist the
    // clean side) when both sides of a large load are consumed
    val all = read(spark, path, schema)
    val clean = all.where(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = all.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, bad)
  }

  /** Export as hash-sharded JSONL (one JSON object per line, `shards`
    * output dirs of part files): shard membership is a pure function
    * of `idCol`, so re-runs and incremental diffs line up. */
  def write(df: DataFrame, path: String, shards: Int = 8,
            idCol: String = "doc_id", compression: Option[String] = None): Unit = {
    val w = df.select(
        pmod(hash(col(idCol)), lit(shards)).as("shard"),
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .repartition(col("shard"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard")
    compression.fold(w)(c => w.option("compression", c)).text(path)
  }
}
