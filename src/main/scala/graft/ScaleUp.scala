package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/**
 * Derive a `factor`x benchmark dataset from a driver-generated sf dir by
 * replicating the FACT tables with key offsets (dimensions copy
 * verbatim) — the scale-validation input for Bench's sf1 pass (VERDICT
 * r3 next #3). Replication — not synthesis: every value in the derived
 * tables comes from the driver's data, and every foreign key stays
 * valid because both sides of a relationship shift by the same
 * per-replica offset (lineitem.l_orderkey and orders.o_orderkey share
 * one offset). Replicated documents/embeddings make every original row
 * a `factor`-clique of exact near-dups — deliberately adversarial for
 * the dedup operators (clique-quadratic candidate generation) and for
 * connected components (500k+ components at sf1).
 *
 * Idempotent: a sentinel file marks a completed derivation; partial
 * output from a crashed run is re-derived.
 */
object ScaleUp {

  private val facts = Seq("orders", "lineitem", "events", "documents", "embeddings")
  private val dims = Seq("region", "nation", "customer", "supplier", "part")

  /** Replicate `src` `factor`x into `dst`; no-op when the sentinel says
    * a previous derivation completed. Returns dst. */
  def ensure(spark: SparkSession, src: String, dst: String, factor: Int = 10): String = {
    val done = new java.io.File(s"$dst/_GRAFT_SCALE_OK")
    if (done.exists()) return dst
    val dstDir = new java.io.File(dst)
    if (dstDir.exists()) { // crashed partial derivation — start clean
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dstDir)
    }
    dstDir.mkdirs()

    // one offset per keyed relationship, from the data itself
    def maxOf(t: String, c: String): Long =
      Tables.load(spark, src, t).agg(max(col(c))).head().getLong(0) + 1L

    val orderOff = maxOf("orders", "o_orderkey")
    val docOff = maxOf("documents", "doc_id")
    val vecOff = maxOf("embeddings", "vec_id")
    val evOff = maxOf("events", "event_id")

    /** table x replica cross product with per-replica key shifts. */
    def replicate(t: String)(shift: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Unit = {
      val base = Tables.load(spark, src, t)
      val out = shift(
        base.withColumn("r", explode(sequence(lit(0L), lit(factor - 1L)))),
        col("r"))
      out.drop("r").write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
    }

    replicate("orders")((d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + r * orderOff))
    replicate("lineitem")((d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + r * orderOff))
    replicate("documents")((d, r) =>
      d.withColumn("doc_id", col("doc_id") + r * docOff))
    replicate("embeddings")((d, r) =>
      d.withColumn("vec_id", col("vec_id") + r * vecOff))
    // events.ts arrives as BIGINT nanos (TIMESTAMP(NANOS) under the
    // legacy conf — see Tables.load); a per-replica second of skew keeps
    // replicated streams from being row-for-row identical at the same
    // instant while preserving per-user session structure
    replicate("events")((d, r) =>
      d.withColumn("event_id", col("event_id") + r * evOff)
        .withColumn("ts", col("ts") + r * 1000000000L))
    for (t <- dims)
      Tables.load(spark, src, t).write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
    done.createNewFile()
    dst
  }
}
