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
 * Determinism: callers should deduplicate the right side per (key, time)
 * (e.g. keep max id) — ties among right rows at the same instant are
 * otherwise arbitrary in any as-of engine.
 */
object AsOfJoin {

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
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = combined
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val leftCols = left.columns.toSeq.map(col)
    val matchCols = rPayload.map(f => col(s"__match.$f").as(f))
    matched.select(leftCols ++ matchCols: _*)
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
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = combined
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val leftCols = left.columns.toSeq.map(col)
    val matchCols = rPayload.map(f => col(s"__match.$f").as(f))
    matched.select(leftCols ++ matchCols: _*)
  }
}
