package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/**
 * Approximate nearest-neighbor search over embedding columns.
 *
 * Two scale paths beyond the brute-force baseline:
 *  - sign-LSH: bucket every vector by the sign pattern of dot products
 *    with fixed random hyperplanes; a query probes only its bucket.
 *    Index build = one projection (no shuffle); search = partition-
 *    prunable equality filter on `bucket`.
 *  - IVF: coarse-quantize to the nearest of C centroids; a query probes
 *    the nprobe nearest centroid lists. At 100 TB the assignment lives
 *    as a partition column so probes prune at the file level.
 *
 * Hyperplanes are deterministic (integer LCG -> double in [-0.5, 0.5]),
 * shared with the DuckDB oracle. The IVF codebook here uses fixed seed
 * rows as centroids — a documented stand-in for a k-means fit (the
 * assignment/probe machinery is identical either way).
 */
object SimilaritySearch {

  /** plane(m)(i) for m planes x d dims: deterministic pseudo-random,
    * single source of truth shared with the oracle SQL. */
  def planes(d: Int): Seq[Seq[Double]] = graft.OracleSql.lshPlanes(d)

  /** Signed dot with plane m (sequential fold — oracle-bit-identical). */
  private def planeDot(vec: Column, plane: Seq[Double]): Column = {
    val planeArr = array(plane.map(lit): _*)
    aggregate(
      zip_with(vec, planeArr, (x, y) => x.cast("double") * y),
      lit(0.0), (acc, x) => acc + x)
  }

  /** LSH bucket id: bit m set iff dot(vec, plane_m) > 0. */
  def signBucket(vec: Column, d: Int): Column =
    planes(d).zipWithIndex.map { case (p, m) =>
      when(planeDot(vec, p) > 0.0, lit(1L << m)).otherwise(0L)
    }.reduce(_ + _)

  /** Bucketed ANN: top-k cosine among vectors sharing the query's bucket. */
  def lshSearch(emb: DataFrame, qid: Long, k: Int, d: Int): DataFrame = {
    val bucketed = emb.withColumn("bucket", signBucket(col("embedding"), d))
    val q = bucketed.where(col("vec_id") === qid)
      .select(col("embedding").as("qv"), col("bucket").as("qbucket"))
    val scored = bucketed.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= qid)
      .withColumn("sim", cosine(col("embedding"), col("qv")))
    val w = Window.orderBy(desc("sim"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("rank"), col("vec_id"))
  }

  /** IVF assignment: nearest centroid per vector (deterministic
    * tie-break on centroid id). centroids: (cid, cvec). */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = emb.crossJoin(broadcast(centroids))
      .withColumn("dist", euclidean(col("embedding"), col("cvec")))
    val w = Window.partitionBy(col("vec_id")).orderBy(asc("dist"), asc("cid"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("embedding"))
  }

  /** Real IVF codebook: k-means (seeded, deterministic per run config)
    * over the embedding column. Returns (cid, cvec) centroids. Used by
    * tests/production; the oracle query keeps a fixed codebook because
    * k-means is not reproducible in SQL. */
  def kmeansCentroids(emb: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._
    val feat = emb.select(array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20).fit(feat)
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toArray.map(_.toFloat)) }
      .toDF("cid", "cvec")
      .withColumn("cvec", col("cvec").cast("array<float>"))
  }

  /** IVF probe search over an explicit codebook. */
  def ivfSearchWith(emb: DataFrame, centroids: DataFrame, qid: Long, nprobe: Int, k: Int): DataFrame = {
    val assigned = ivfAssign(emb, centroids)
    val q = emb.where(col("vec_id") === qid).select(col("embedding").as("qv"))
    val probeCents = centroids.crossJoin(broadcast(q))
      .withColumn("qdist", euclidean(col("cvec"), col("qv")))
    val wp = Window.orderBy(asc("qdist"), asc("cid"))
    val probed = probeCents.withColumn("prn", row_number().over(wp))
      .where(col("prn") <= nprobe).select("cid")
    val scored = assigned.join(probed, "cid")
      .where(col("vec_id") =!= qid)
      .crossJoin(broadcast(q))
      .withColumn("sim", cosine(col("embedding"), col("qv")))
    val w = Window.orderBy(desc("sim"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("rank"), col("vec_id"))
  }

  /** IVF with the fixed seed-row codebook (oracle-reproducible variant;
    * see kmeansCentroids for the fitted codebook). */
  def ivfSearch(emb: DataFrame, qid: Long, nCentroids: Int, nprobe: Int, k: Int): DataFrame = {
    val centroids = emb.where(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    ivfSearchWith(emb, centroids, qid, nprobe, k)
  }
}
