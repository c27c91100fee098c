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

  /** What [[joinAuto]] chose and why — returned alongside the joined
    * frame so callers and specs assert the physical strategy instead
    * of trusting it. `smallBytes` is the optimizer's size estimate of
    * the small side; `hotKeys`/`nSalts` are populated only on the
    * salted path. */
  final case class JoinChoice(strategy: String, smallBytes: BigInt,
                              hotKeys: Seq[Any], nSalts: Int)

  /**
   * Profile-driven equi-join — the decision helper that turns
   * [[Sketch.skewProfile]] from a diagnostic into a strategy
   * (VERDICT r12 next #5). Order of preference:
   *
   *  1. **broadcast** when the optimizer's size estimate of `small`
   *     is within `broadcastBytes` — no shuffle at all; the estimate
   *     is Catalyst's own (`optimizedPlan.stats`), the same signal
   *     the auto-broadcast rule uses, so the helper never collects
   *     the small side to find out.
   *  2. **salted** when the profile of the large side's key finds hot
   *     keys at or above `hotSkewX1000` (1000 = a perfectly uniform
   *     key; the default 4000 = 4x uniform): those keys fan out over
   *     `ceil(maxSkew/1000)` salts (clamped to [2, nSaltsCap]) via
   *     [[saltedJoin]]. The profile is ONE map-side-combined pass
   *     over the large side and the collect is topK rows — metadata,
   *     never corpus.
   *  3. **plain** otherwise — the ordinary shuffled equi-join, which
   *     is correct and optimal when neither side is small nor skewed.
   *
   * The three paths are value-identical; only the physical plan
   * differs (PlanSpec pins one plan shape per path). The returned
   * [[JoinChoice]] carries the evidence; thread `strategy` into an
   * output literal when a result should hash-pin the decision.
   */
  def joinAuto(large: DataFrame, small: DataFrame,
               largeKey: String, smallKey: String, saltSrc: String,
               broadcastBytes: Long = 10L << 20,
               hotSkewX1000: Long = 4000,
               topK: Int = 20,
               nSaltsCap: Int = 64): (DataFrame, JoinChoice) = {
    require(hotSkewX1000 >= 1000,
      s"graft: hotSkewX1000 $hotSkewX1000 below uniform (1000) would salt everything")
    val smallBytes = small.queryExecution.optimizedPlan.stats.sizeInBytes
    if (smallBytes <= broadcastBytes) {
      (large.join(broadcast(small), col(largeKey) === col(smallKey)),
        JoinChoice("broadcast", smallBytes, Nil, 0))
    } else {
      val hot = graft.operators.Sketch.skewProfile(large, largeKey, topK)
        .where(col("skew_x1000") >= hotSkewX1000)
        .select(col(largeKey), col("skew_x1000"))
        .collect()
      if (hot.nonEmpty) {
        val keys = hot.map(_.get(0)).toSeq
        val maxSkew = hot.map(_.getLong(1)).max
        val nSalts = math.min(nSaltsCap.toLong,
          math.max(2L, (maxSkew + 999L) / 1000L)).toInt
        (saltedJoin(large, small, largeKey, smallKey, keys, nSalts, saltSrc),
          JoinChoice("salted", smallBytes, keys, nSalts))
      } else {
        (large.join(small, col(largeKey) === col(smallKey)),
          JoinChoice("plain", smallBytes, Nil, 0))
      }
    }
  }
}
