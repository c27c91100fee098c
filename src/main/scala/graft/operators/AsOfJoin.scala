package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join: for every left row, the latest right row with the
 * same key and right.time <= left.time (inclusive).
 *
 * Spark has no ASOF JOIN operator. Rather than a custom SparkPlan, this
 * composes built-ins into the same physical shape a native
 * AsOfJoinExec would want: ONE shuffle on the key (union of both sides),
 * ONE sort per partition (time, side), and a running `last(ignoreNulls)`
 * — O(n log n) per key group, no range-join explosion, AQE-compatible.
 * A range-condition join would be O(L*R) per key before filtering; this
 * is the scalable formulation for 100 TB event tables.
 *
 * Determinism: when the right payload is an ORDERABLE type (no map
 * fields), ties among right rows at the same (key, time) instant are
 * broken deterministically — the struct-greatest payload wins (the
 * payload struct is a trailing window sort key). When the payload
 * contains a map (unorderable in Spark), the tie-breaker cannot be
 * applied and callers must deduplicate the right side per (key, time)
 * themselves — ties are otherwise arbitrary.
 */
object AsOfJoin {

  /** Spark can sort a struct iff no field (recursively) is a MapType. */
  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType  => orderable(a.elementType)
    case _: org.apache.spark.sql.types.MapType    => false
    case _                                        => true
  }

  /**
   * @param left      probe side
   * @param right     reference side (its non-key, non-time columns are
   *                  emitted, null when no match)
   * @param keys      equi-join keys present on both sides
   * @param leftTime  left ordering column name (numeric or timestamp)
   * @param rightTime right ordering column name
   */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val rPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val rStructType = right.select(rPayload.map(col): _*).schema

    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(rPayload.map(col): _*).as("__r")): _*)

    val combined = l2.unionByName(r2, allowMissingColumns = true)
    // trailing payload sort key = deterministic (key, time)-tie winner;
    // left rows carry null payloads so the extra key is inert for them
    val tieBreak = if (orderable(rStructType)) Seq(col("__r").asc) else Nil
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(Seq(col("__t").asc, col("__side").asc) ++ tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = combined
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val leftCols = left.columns.toSeq.map(col)
    val matchCols = rPayload.map(f => col(s"__match.$f").as(f))
    matched.select(leftCols ++ matchCols: _*)
  }

  /**
   * [[backward]] bounded by a staleness tolerance: a match older than
   * `tolerance` (left.time - right.time > tolerance, in the time
   * columns' own units — numeric time columns required) counts as NO
   * match and its payload nulls out — the pandas `merge_asof`
   * tolerance semantics. Same single-shuffle shape as [[backward]]:
   * the bound is a post-window projection, never a range-join
   * condition, so the O(L*R) explosion a `BETWEEN` join would plan
   * never appears.
   */
  def backwardWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Long): DataFrame =
    within(backward, left, right, keys, leftTime, rightTime, tolerance,
      backwardStale = true)

  /** Shared tolerance tail for both directions: thread the matched
    * right time through as an extra payload column, then null every
    * payload column where the gap exceeds the bound — ONE select (a
    * per-column withColumn chain would stack a Project node per
    * payload column on the operator advertised for wide event
    * tables). */
  private def within(
      joinFn: (DataFrame, DataFrame, Seq[String], String, String) => DataFrame,
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, tolerance: Long,
      backwardStale: Boolean): DataFrame = {
    require(tolerance >= 0, s"graft: asof tolerance $tolerance must be >= 0")
    val rt = "__asof_rt"
    val joined = joinFn(left, right.withColumn(rt, col(rightTime)),
      keys, leftTime, rightTime)
    val rPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSet
    val gap = if (backwardStale) col(leftTime) - col(rt) else col(rt) - col(leftTime)
    val stale = col(rt).isNull || (gap > tolerance)
    joined.select(joined.columns.filterNot(_ == rt).toIndexedSeq.map { c =>
      if (rPayload(c)) when(stale, lit(null)).otherwise(col(c)).as(c) else col(c)
    }: _*)
  }

  /**
   * Forward as-of join: for every left row, the EARLIEST right row with
   * the same key and right.time >= left.time (inclusive) — next-event
   * attribution (e.g. "first click after each error"). Same single
   * shuffle + single per-key sort shape as [[backward]], with the
   * running `last(ignoreNulls)` taken over DESCENDING time (right rows
   * first at equal instants, so the inclusive match holds).
   */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val rPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val rStructType = right.select(rPayload.map(col): _*).schema

    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(rPayload.map(col): _*).as("__r")): _*)

    val combined = l2.unionByName(r2, allowMissingColumns = true)
    // same deterministic tie-break as backward: among right rows at an
    // equal (key, time), the struct-greatest payload is the match
    val tieBreak = if (orderable(rStructType)) Seq(col("__r").asc) else Nil
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(Seq(col("__t").desc, col("__side").asc) ++ tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = combined
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val leftCols = left.columns.toSeq.map(col)
    val matchCols = rPayload.map(f => col(s"__match.$f").as(f))
    matched.select(leftCols ++ matchCols: _*)
  }

  /** [[forward]] with the symmetric staleness bound: a match further
    * ahead than `tolerance` (right.time - left.time > tolerance)
    * nulls out. Same post-window projection shape as
    * [[backwardWithin]]. */
  def forwardWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Long): DataFrame =
    within(forward, left, right, keys, leftTime, rightTime, tolerance,
      backwardStale = false)
}
