package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}

/**
 * Range (interval) join: pair every point row with every interval row
 * whose `[start, end)` contains the point, optionally under equi-keys.
 *
 * Spark has no range-join operator: a bare `ON p >= s AND p < e`
 * predicate plans as BroadcastNestedLoopJoin (or a cartesian) — O(L·R)
 * work that is fine for a 100-row dimension and fatal for two fact
 * tables. This is the standard bucketed rewrite: every interval is
 * exploded to the fixed-width buckets it overlaps, points map to their
 * single bucket, and the join becomes a hash EQUI-join on
 * (keys…, bucket) followed by the exact range filter. Each qualifying
 * (point, interval) pair is produced exactly once — the point's bucket
 * appears exactly once in the interval's bucket list — so no dedup
 * pass is needed.
 *
 * Scale shape: one shuffle keyed by (keys…, bucket); the interval side
 * is replicated by `len/width + 1` per row, so pick `bucketWidth` near
 * the typical interval length (replication ~2×). Hot buckets are
 * ordinary equi-join skew — AQE's skew-join split applies, which it
 * never would to a nested-loop plan. Catalyst still broadcasts the
 * exploded interval side when it is small, so the dimension-table case
 * keeps its broadcast plan; the rewrite only removes the O(L·R) cliff.
 */
object RangeJoin {

  /**
   * @param points      point side; all its columns are emitted
   * @param intervals   interval side; all its columns except
   *                    `startCol`/`endCol` helper buckets are emitted
   * @param pointCol    INTEGRAL point column on `points` (byte/short/
   *                    int/long — enforced; fractional coordinates
   *                    would truncate toward zero in the bucket math
   *                    and silently drop negative-fraction matches.
   *                    Scale fractional timestamps to integer units
   *                    — millis/nanos — before calling)
   * @param startCol    integral inclusive start column on `intervals`
   * @param endCol      integral exclusive end column on `intervals`;
   *                    empty (`end <= start`) intervals match nothing
   * @param bucketWidth positive bucket width in the point column's units
   * @param keys        optional equi-keys present on both sides
   * @param maxBucketsPerInterval guard against a pathological interval
   *        (or a mis-chosen width) exploding into an executor-killing
   *        bucket array — the job fails loudly naming the row instead
   */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, s"graft: bucketWidth $bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "graft: maxBucketsPerInterval must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"graft: non-key columns ${overlap.mkString(", ")} exist on both sides; rename first")
    // Integer-coordinate contract: the bucket math below is exact only
    // for integral types. A DoubleType point would cast('long') with
    // truncation toward zero (-10.5 @ width 10 → bucket -1, belongs in
    // -2), and a fractional end makes the `end - 1` last-bucket math
    // under-cover — both silently DROP qualifying pairs.
    def requireIntegral(df: DataFrame, c: String): Unit = {
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"graft: column $c is $dt; pointInInterval requires integral " +
          "coordinates (scale fractional units to int/long first)")
    }
    requireIntegral(points, pointCol)
    requireIntegral(intervals, startCol)
    requireIntegral(intervals, endCol)

    // Exact integer floorDiv: `floor(x / w)` round-trips through
    // double, which mangles epoch-nanos (~1.8e18 > 2^53), and `div`
    // alone truncates toward zero, mis-bucketing negative coordinates.
    // x - pmod(x, w) is an exact multiple of w, so its `div` is both
    // exact and floor-directed — all-integer arithmetic. (Column./ is
    // double division; SQL `div` needs expr over a staged column.)
    val w = bucketWidth
    def floorDivExpr(c: String): String = s"(($c - pmod($c, ${w}L)) div ${w}L)"

    val ivs = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__s", col(startCol).cast("long"))
      .withColumn("__e1", col(endCol).cast("long") - 1)
      .withColumn("__b0", expr(floorDivExpr("__s")))
      .withColumn("__b1", expr(floorDivExpr("__e1")))
      // fail LOUDLY on an interval that would explode into a giant
      // bucket array (Spark's sequence() would otherwise die deep in a
      // task with an opaque allocation error, or OOM the executor)
      .withColumn("__b1", when(col("__b1") - col("__b0") >= maxBucketsPerInterval,
        raise_error(concat(lit(s"graft: interval spans >= $maxBucketsPerInterval " +
          s"buckets at width $bucketWidth (start "), col("__s"),
          lit(", end "), col("__e1") + 1,
          lit("); widen bucketWidth or split the interval"))))
        .otherwise(col("__b1")))
      .withColumn("__bkt", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__s", "__e1", "__b0", "__b1")
    val pts = points
      .withColumn("__p", col(pointCol).cast("long"))
      .withColumn("__bkt", expr(floorDivExpr("__p")))
      .drop("__p")

    pts.join(ivs, (keys :+ "__bkt").toSeq)
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bkt")
  }

  /**
   * Interval × interval OVERLAP join: pair every left interval with
   * every right interval it overlaps (`lStart < rEnd && rStart < lEnd`,
   * both half-open `[start, end)`), optionally under equi-keys.
   *
   * Same bucketed rewrite as [[pointInInterval]], with one extra device
   * because BOTH sides now explode: an overlapping pair meets in every
   * bucket their covering ranges share, so a bare bucket equi-join
   * would emit duplicates. Instead of a dedup shuffle, each pair is
   * kept only in its CANONICAL bucket — the one containing
   * `max(lStart, rStart)`. That bucket is covered by both sides exactly
   * once whenever the pair overlaps (max(start) <= min(end)-1 for
   * non-empty integer overlap), so the output is exactly-once with a
   * plain post-join filter and no distinct.
   *
   * Scale shape: one hash equi-join keyed by (keys…, bucket); each side
   * is replicated by `len/width + 1`, so pick `bucketWidth` near the
   * typical interval length of the DENSER side. Hot buckets are
   * ordinary equi-join skew (AQE-splittable) — never a nested-loop
   * plan, which is what Spark gives the raw overlap predicate.
   */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStartCol: String,
      lEndCol: String,
      rStartCol: String,
      rEndCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, s"graft: bucketWidth $bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "graft: maxBucketsPerInterval must be positive")
    val overlapCols = left.columns.toSet
      .intersect(right.columns.toSet) -- keys
    require(overlapCols.isEmpty,
      s"graft: non-key columns ${overlapCols.mkString(", ")} exist on both sides; rename first")
    def requireIntegral(df: DataFrame, c: String): Unit = {
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"graft: column $c is $dt; intervalOverlap requires integral " +
          "coordinates (scale fractional units to int/long first)")
    }
    Seq(lStartCol, lEndCol).foreach(requireIntegral(left, _))
    Seq(rStartCol, rEndCol).foreach(requireIntegral(right, _))

    val w = bucketWidth
    def floorDivExpr(c: String): String = s"(($c - pmod($c, ${w}L)) div ${w}L)"

    def explodeSide(df: DataFrame, s: String, e: String): DataFrame = df
      .where(col(e) > col(s))
      .withColumn("__s", col(s).cast("long"))
      .withColumn("__e1", col(e).cast("long") - 1)
      .withColumn("__b0", expr(floorDivExpr("__s")))
      .withColumn("__b1", expr(floorDivExpr("__e1")))
      .withColumn("__b1", when(col("__b1") - col("__b0") >= maxBucketsPerInterval,
        raise_error(concat(lit(s"graft: interval spans >= $maxBucketsPerInterval " +
          s"buckets at width $bucketWidth (start "), col("__s"),
          lit(", end "), col("__e1") + 1,
          lit("); widen bucketWidth or split the interval"))))
        .otherwise(col("__b1")))
      .withColumn("__bkt", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__s", "__e1", "__b0", "__b1")

    val ls = explodeSide(left, lStartCol, lEndCol)
    val rs = explodeSide(right, rStartCol, rEndCol)
    ls.join(rs, (keys :+ "__bkt").toSeq)
      .where(col(lStartCol) < col(rEndCol) && col(rStartCol) < col(lEndCol))
      // canonical-bucket filter: exactly-once without a distinct
      .where(col("__bkt") ===
        expr(floorDivExpr(s"greatest(${lStartCol}, ${rStartCol})")))
      .drop("__bkt")
  }
}
