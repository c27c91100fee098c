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
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark's converter
      // rejects; read nanos as BIGINT (session-level legacy conf) and
      // derive epoch-second / timestamp columns from integer math.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with ts as BIGINT nanos (`ts_ns`) plus a proper timestamp
    * column (`ts`, microsecond precision) for streaming/window use. */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))

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
