package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Bucketed-table co-location: the standing answer to "this join shuffles
 * 100 TB every night". Writing both sides bucketed (and sorted) by the
 * join key is a one-time shuffle; every subsequent equi-join on that key
 * plans as a zero-Exchange SortMergeJoin — each task reads matching
 * bucket files from both sides. Spark-native bucketing (no Hive
 * dependency); the bucket contract lives in the catalog, so the
 * co-location survives across sessions and queries.
 *
 * Gate: PlanSpec asserts the bucketed join plan contains no
 * `Exchange hashpartitioning`.
 */
object Bucketing {

  /** One-time bucketed materialization (the amortized shuffle). */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int, key: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join of two tables bucketed with the SAME bucket count on the
    * join keys: plans with no Exchange on either side. The merge hint
    * pins SortMergeJoin — the strategy the bucket layout pays for (at
    * test scale the planner would otherwise broadcast the small side,
    * which never demonstrates the co-location). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).hint("merge")
      .join(spark.table(right), col(leftKey) === col(rightKey))
}
