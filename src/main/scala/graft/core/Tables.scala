package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical row of the vector store: mirrors the reference's logical
  * table (id, vector, content, tags) — reference: src/db.rs:29-52.
  */
case class VectorRecord(
    id: String,
    vector: Array[Float],
    content: String,
    tags: Seq[String])

/** Loaders for the driver-generated test tables (TESTDATA.md) and the
  * canonical vector table assembled from them.
  */
object Tables {

  val tpch: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // Fixture generations differ in events.ts physical type: older
      // ones write TIMESTAMP(NANOS) (which Spark's converter rejects —
      // read nanos as BIGINT via the legacy conf), newer ones plain
      // timestamp[us] with isAdjustedToUTC=false. Disable NTZ inference
      // so the micros variant reads as TIMESTAMP whose unix_micros IS
      // the stored int64 — session-timezone-independent, matching the
      // oracle's (DuckDB's) naive-epoch interpretation.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with ts as BIGINT nanos (`ts_ns`) plus a proper timestamp
    * column (`ts`, microsecond precision) for streaming/window use —
    * normalized to this shape from EITHER fixture generation (BIGINT
    * nanos or timestamp[us]); every downstream operator does integer
    * math on `ts_ns` only, so results are bit-identical across
    * generations (micros-precision fixtures simply carry ts_ns values
    * that are multiples of 1000, exactly like the oracle's epoch_ns). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer div, NOT `/`: Spark's `/` on longs goes through
        // double, which rounds epoch-nanos (~1.8e18, above 2^53) to
        // ~512 ns granularity — the derived micros would drift ±1
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        // normalize ts to TIMESTAMP (ltz) as well: pyarrow-written
        // fixtures arrive NTZ-annotated (isAdjustedToUTC=false) unless
        // the inference conf is off, and Spark-written parquet keeps
        // NTZ via footer metadata regardless — downstream code sees ONE
        // ts type either way (sessions pin UTC, so the cast is exact)
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }

  /**
   * The canonical vector table: embeddings joined with documents
   * (vec_id = doc_id), tags derived from (lang, source), normalized
   * sorted+distinct exactly like the reference normalizes its tag sets
   * (BTreeSet: reference src/db.rs:223-228).
   *
   * The join broadcasts the smaller side automatically at this scale;
   * at 100 TB both sides share the id key, so co-partitioning on id
   * (bucketing) removes the shuffle entirely.
   */
  def vectorTable(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    val docs = load(spark, dir, "documents")
    emb.join(docs, emb("vec_id") === docs("doc_id"), "inner")
      .select(
        emb("vec_id").as("id"),
        emb("embedding").as("vector"),
        docs("text").as("content"),
        array_sort(array_distinct(array(docs("lang"), docs("source")))).as("tags"))
  }
}
