package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /**
   * SALTED equi-join for skewed keys — the explicit fix when one join
   * key holds a corpus-sized share of the rows, the right side is too
   * big to broadcast, and a plain shuffle join would send that key's
   * entire volume through one reducer. AQE's skew split handles
   * sort-merge stragglers after the fact; this is the constructive
   * form: hot keys on the LARGE side fan out over `nSalts` sub-keys
   * (a deterministic hash of `saltSrc`, so reruns shuffle
   * identically), and the hot keys' rows on the SMALL side are
   * replicated once per salt. Cold keys keep salt 0 on both sides —
   * zero replication where none is needed. The join on
   * (key, salt) is value-identical to the plain equi-join: every
   * large-side row meets exactly the one replica carrying its salt.
   * So the operator keeps a plain-SQL oracle; the salt never reaches
   * the output.
   *
   * Feed `hotKeys` from [[Sketch.skewProfile]] (keys with large
   * `skew_x1000`). The list rides the plan as an IN-list — keep it
   * profile-sized (the guard caps it), never key-spectrum-sized.
   *
   * @param hotKeys keys to salt (non-empty, <= 10k — an IN-list, and
   *                the small side replicates |hotKeys| * nSalts rows)
   * @param nSalts  replication factor for hot keys (2..4096); pick ~
   *                the profiled `skew_x1000 / 1000` of the hottest key
   * @param saltSrc a large-side column whose per-row hash spreads a
   *                hot key's rows across salts (any well-distributed
   *                id; need not be unique)
   */
  def saltedJoin(large: DataFrame, small: DataFrame,
                 largeKey: String, smallKey: String,
                 hotKeys: Seq[Any], nSalts: Int, saltSrc: String): DataFrame = {
    require(nSalts > 1 && nSalts <= 4096, s"graft: nSalts $nSalts outside (1, 4096]")
    require(hotKeys.nonEmpty, "graft: empty hotKeys — use a plain join")
    require(hotKeys.size <= 10000,
      s"graft: ${hotKeys.size} hot keys — that is not skew, rethink the join")
    val l = large.withColumn("__graft_salt",
      when(col(largeKey).isInCollection(hotKeys),
        pmod(xxhash64(col(saltSrc)), lit(nSalts.toLong)))
        .otherwise(lit(0L)))
    val r = small.withColumn("__graft_salts",
        when(col(smallKey).isInCollection(hotKeys),
          sequence(lit(0L), lit(nSalts.toLong - 1L)))
          .otherwise(array(lit(0L))))
      .withColumn("__graft_salt_r", explode(col("__graft_salts")))
      .drop("__graft_salts")
    l.join(r, l(largeKey) === r(smallKey) &&
        l("__graft_salt") === r("__graft_salt_r"))
      .drop("__graft_salt", "__graft_salt_r")
  }
}
