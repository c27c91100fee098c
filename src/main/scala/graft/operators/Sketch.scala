package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Sketch-accelerated EXACT heavy hitters: every key whose frequency is
 * at least `phi` of the input, with its exact count.
 *
 * The naive plan — `groupBy(key).count().where(n >= t)` — shuffles
 * every distinct key and holds every distinct key in the partial-agg
 * hash maps. At 100 TB of tokens that is billions of distinct keys
 * through the exchange to keep a handful of survivors. The classic
 * two-pass fix:
 *
 *  1. ONE pass builds a Count-Min sketch with Spark's own
 *     `count_min_sketch` aggregate (fixed-size, map-side mergeable —
 *     the exchange carries kilobytes) plus the exact row count.
 *  2. A second pass filters rows through the broadcast sketch BEFORE
 *     any aggregation: CMS never underestimates, so every true heavy
 *     hitter's rows survive (zero false negatives); only candidate
 *     keys — true hitters plus an eps-bounded sliver of false
 *     positives — enter the partial agg and the shuffle. The exact
 *     `count >= t` HAVING then removes the false positives.
 *
 * The result is bit-identical to the naive plan (it is an exact
 * operator, so it carries a plain SQL oracle) while the shuffle and
 * agg-state volume depend on the candidate set, not on the distinct
 * key count. The sketch's accuracy only tunes the false-positive
 * sliver, never correctness.
 */
object Sketch {

  /**
   * @param keys   input rows; only `keyCol` is consulted
   * @param keyCol string key column
   * @param phi    heavy-hitter share threshold in (0, 1); a key
   *               qualifies iff count >= ceil(phi * totalRows).
   *               Oracle-parity note: pick a dyadic phi (1/32, 1/64…)
   *               if a SQL engine recomputes the threshold — decimal
   *               vs double `ceil(phi*n)` can differ off-dyadics.
   * @param eps    CMS relative error (width ~ 2/eps); tunes the
   *               false-positive sliver, not correctness
   * @param pin    lazily localCheckpoint the input so the two passes
   *               share one materialization (right for derived inputs
   *               like token streams; disable for plain table scans)
   */
  def heavyHitters(keys: DataFrame, keyCol: String, phi: Double,
      eps: Double = 1e-3, confidence: Double = 0.99, seed: Int = 42,
      pin: Boolean = true): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"graft: phi $phi outside (0, 1)")
    GraftFunctions.register(keys.sparkSession)
    val src = if (pin) keys.localCheckpoint(eager = false) else keys
    val probe = src.agg(count(lit(1)).as("n"),
      count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)).as("cms"))
      .head()
    val n = probe.getLong(0)
    val exact = src.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    if (n == 0L) return exact // empty input: empty result, same schema
    val t = math.ceil(phi * n).toLong
    src.where(GraftFunctions.cmsEstimate(col(keyCol), probe.getAs[Array[Byte]](1)) >= t)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .where(col("n") >= t)
  }
}
