package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * The engine facade: a tag-partitioned embedding store with top-k
 * similarity search — the full query surface of the reference engine
 * (insert: src/db.rs:142-164; search: src/db.rs:217-283; clear:
 * src/db.rs:608-625) re-expressed as Parquet + DataFrame operators.
 *
 * Storage layout (mirrors the reference's exact-tag-set partitioning,
 * src/db.rs:645-650, as a Hive-style partition column):
 *
 *   <root>/data/tag_key=<sha256(json(sorted tags))>/... .parquet
 *
 * Tag-superset partition pruning (reference src/db.rs:687-706) is done
 * driver-side: the distinct (tag_key -> tags) manifest is tiny (one row
 * per distinct tag-set); we resolve matching keys on the driver and
 * inject `tag_key IN (...)`, which Spark turns into static partition
 * pruning — non-matching partitions are never read. At high tag
 * cardinality (100 TB regime) exact-set partitioning explodes; the
 * row-level `forall tags` filter path below stays correct and relies on
 * Parquet row-group stats instead.
 */
class VectorStore(spark: SparkSession, root: String) {
  GraftFunctions.register(spark)
  import GraftFunctions._

  private val dataPath = s"$root/data"
  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  /** Normalize tags exactly like the reference (sorted, distinct set). */
  private def normTags(c: Column): Column = array_sort(array_distinct(c))

  private def tagKey(c: Column): Column = sha2(to_json(normTags(c)), 256)

  /**
   * Append rows (id, vector, content, tags). Assigns UUIDs when `id`
   * is absent (reference assigns uuid-v4 at insert, src/db.rs:151).
   * Enforces a single embedding dimension per store (reference panics
   * on mismatch, src/db.rs:514-525) — checked against both the incoming
   * batch and the stored dimension, using cheap aggregates.
   * `quantize=true` stores the packed codec struct alongside (4x smaller
   * scan for quantized search at scale).
   */
  def insert(df: DataFrame, quantize: Boolean = false): Unit = {
    val withId =
      if (df.columns.contains("id")) df
      else df.withColumn("id", expr("uuid()"))
    val dims = withId.select(size(col("vector")).as("d")).agg(
      min("d").as("mn"), max("d").as("mx")).head()
    require(dims.getInt(0) == dims.getInt(1),
      s"graft: mixed embedding dimensions in batch (${dims.getInt(0)} vs ${dims.getInt(1)})")
    storedDim().foreach { d =>
      require(d == dims.getInt(0),
        s"graft: embedding dimension ${dims.getInt(0)} does not match store dimension $d")
    }
    val out0 = withId
      .withColumn("tags", normTags(col("tags")))
      .withColumn("tag_key", tagKey(col("tags")))
    val out = if (quantize) out0.withColumn("packed", pack(col("vector"))) else out0
    out.write.mode(SaveMode.Append).partitionBy("tag_key").parquet(dataPath)
  }

  private def storedDim(): Option[Int] =
    if (!exists) None
    else table().select(size(col("vector"))).limit(1).collect()
      .headOption.map(_.getInt(0))

  def exists: Boolean = fs.exists(new org.apache.hadoop.fs.Path(dataPath))

  def table(): DataFrame = spark.read.parquet(dataPath)

  /** Driver-side superset pruning: distinct tag-sets are few; resolve
    * the matching partition keys and let static partition pruning skip
    * everything else. Returns None when the query has no tags (all
    * partitions match — reference src/db.rs:697 empty-set is subset of
    * all). */
  private def matchingTagKeys(queryTags: Seq[String]): Option[Seq[String]] = {
    if (queryTags.isEmpty) return None
    val manifest = table().select(col("tag_key"), col("tags")).distinct().collect()
    val q = queryTags.distinct.toSet
    Some(manifest.toSeq
      .filter(r => q.subsetOf(r.getSeq[String](1).toSet))
      .map(_.getString(0)))
  }

  /**
   * Top-k nearest neighbors (reference src/db.rs:217-283). The plan is
   *   PartitionPrunedScan -> Project[sim] -> TakeOrderedAndProject(k)
   * — Spark's TakeOrderedAndProject is a per-partition bounded heap +
   * driver merge, the distributed equivalent of the reference's
   * BinaryHeap loop (src/db.rs:257-272). No shuffle: only k rows per
   * partition travel to the driver.
   */
  def search(
      queryVec: Seq[Float],
      tags: Seq[String] = Nil,
      k: Int = 10,
      metric: String = "cosine",
      quantized: Boolean = false): DataFrame = {
    val base = table()
    val pruned = matchingTagKeys(tags) match {
      case Some(keys) => base.where(col("tag_key").isin(keys: _*))
      case None => base
    }
    // Row-level guard as well: correct even if the store was written
    // without partitioning (or with quantize-only layout).
    val tagFiltered =
      if (tags.isEmpty) pruned
      else pruned.where(tags.distinct.map(t => array_contains(col("tags"), t)).reduce(_ && _))
    val v = if (quantized) unpack(col("packed")) else col("vector")
    val q = vecLit(queryVec)
    val scored = metric match {
      case "cosine" => tagFiltered.withColumn("similarity", cosine(v, q))
      case "euclidean" =>
        // negate so "higher = closer" uniformly (fixes reference quirk,
        // SURVEY.md §2 #15)
        tagFiltered.withColumn("similarity", -euclidean(v, q))
      case m => throw new IllegalArgumentException(s"graft: unknown metric $m")
    }
    scored
      .where(!isnan(col("similarity")))
      .select(col("similarity"), col("id"), col("content"), col("tags"))
      .orderBy(desc("similarity"), asc("id"))
      .limit(k)
  }

  /** Drop the store (reference clear, src/db.rs:608-625). */
  def clear(): Unit = {
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }
}
