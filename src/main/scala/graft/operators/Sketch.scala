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
   * @param keys   input rows; only `keyCol` is consulted. NULL keys are
   *               EXCLUDED from both the rank space (totalRows counts
   *               non-null keys) and the output — the aggregate skips
   *               them and the null-safe probe drops them, matching
   *               SQL `count(col)` semantics rather than a groupBy's
   *               NULL group
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
    val nonNull = keys.where(col(keyCol).isNotNull)
    val src = if (pin) nonNull.localCheckpoint(eager = false) else nonNull
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

  /**
   * Bloom-accelerated EXACT left-semi join: `left` rows whose `key`
   * appears in `right` — with a driver-built Bloom filter on the right
   * keys pre-filtering the LEFT side before its exchange.
   *
   * When the right side is too large to broadcast, a plain semi join
   * shuffles BOTH full sides. The right KEY SET, though, fits a Bloom
   * filter at ~10 bits/key — orders of magnitude under a broadcast
   * hash relation — so probing it below the left scan kills
   * (1 - selectivity - fpp) of the left side's shuffle volume. Bloom
   * filters have no false negatives through the matching put/probe
   * hash routes (spec-pinned), so no real match is lost; the exact
   * semi join on the survivors removes the fpp sliver, keeping the
   * operator bit-exact with its plain-SQL oracle.
   *
   * Relationship to Spark's own runtime bloom filters
   * (`spark.sql.optimizer.runtime.bloomFilter.enabled`): Catalyst
   * injects one only inside a single query, under size/selectivity
   * heuristics it controls. This operator is the EXPLICIT form — the
   * filter is yours to build once (e.g. on a store's live ids) and
   * reuse across many queries/batches, deterministically.
   *
   * @param expectedItems sizing for the filter (right-side distinct
   *                      keys); fpp degrades, never correctness, if
   *                      underestimated
   */
  def bloomSemiJoin(left: DataFrame, right: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, s"graft: expectedItems $expectedItems must be positive")
    GraftFunctions.register(left.sparkSession)
    val bf = right.stat.bloomFilter(key, expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    left.where(GraftFunctions.bloomContains(col(key), bytes))
      .join(right.select(col(key)).distinct(), Seq(key), "left_semi")
  }

  /**
   * EXACT quantile at scale, two passes: the `ceil(p*n)`-th smallest
   * value (multiset rank, lower tie). The exact `percentile()`
   * aggregate buffers every value per group — a global sort in
   * disguise — and `percentile_approx` gives up exactness. This is the
   * classic bracket-then-select:
   *
   *  1. `percentile_approx` at `p ± 4/accuracy` brackets the answer:
   *     by the sketch's rank-error contract (± n/accuracy) the true
   *     target's value lies in [vlo, vhi].
   *  2. One exact pass counts rows strictly below `vlo` and the
   *     bracket window `[vlo, vhi]` — ~8n/accuracy rows — feeds a
   *     bounded TakeOrdered heap that selects the (r - below)-th
   *     smallest. Nothing global is sorted; pick `accuracy` so
   *     n/accuracy fits a heap (1e7 at n=1e12 keeps windows ~1e5).
   *
   * The sketch can only mis-bracket if its error contract is violated;
   * the guard detects that (rank outside the window) and falls back to
   * the full-range select, so the result is exact UNCONDITIONALLY —
   * which is what lets the oracle pin it with ORDER BY/OFFSET SQL.
   * Oracle-parity note: use dyadic p (1/4, 1/2, 3/4…) so `ceil(p*n)`
   * agrees between decimal and double arithmetic.
   *
   * @return the exact quantile value, or None on an empty input
   */
  def exactQuantile(df: DataFrame, valueCol: String, p: Double,
      accuracy: Int = 10000): Option[Double] =
    exactQuantiles(df, valueCol, Seq(p), accuracy).head

  /** Batched [[exactQuantile]]: ALL requested quantiles share the one
    * bracket aggregate and the one exact counting pass — 2 + |ps|
    * bounded selects instead of 4·|ps| jobs. */
  def exactQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
      accuracy: Int = 10000): Seq[Option[Double]] = {
    require(ps.nonEmpty, "graft: no quantiles requested")
    ps.foreach(p => require(p > 0.0 && p <= 1.0, s"graft: p $p outside (0, 1]"))
    require(accuracy >= 100, s"graft: accuracy $accuracy < 100")
    val src = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .localCheckpoint(eager = false)
    val n = src.count()
    if (n == 0L) return ps.map(_ => None)
    val brackets = ps.map { p =>
      (math.max(0.0, p - 4.0 / accuracy), math.min(1.0, p + 4.0 / accuracy))
    }
    val qlist = brackets.flatMap { case (a, b) => Seq(a, b) }.mkString(", ")
    val br = src.agg(expr(
      s"percentile_approx(v, array($qlist), $accuracy)").as("b")).head()
      .getSeq[Double](0)
    val bounds = ps.indices.map(i => (br(2 * i), br(2 * i + 1)))
    val cntCols = bounds.zipWithIndex.flatMap { case ((vlo, vhi), i) => Seq(
      sum(when(col("v") < vlo, 1L).otherwise(0L)).as(s"below_$i"),
      sum(when(col("v") >= vlo && col("v") <= vhi, 1L).otherwise(0L)).as(s"win_$i")) }
    val cnt = src.agg(cntCols.head, cntCols.tail: _*).head()
    ps.indices.map { i =>
      val (vlo, vhi) = bounds(i)
      val r = math.ceil(ps(i) * n).toLong
      val (below, win) = (cnt.getLong(2 * i), cnt.getLong(2 * i + 1))
      val k = r - below
      val (windowDf, kk) =
        if (k >= 1L && k <= win) (src.where(col("v") >= vlo && col("v") <= vhi), k)
        else (src, r) // sketch contract violated: exact full-range fallback
      require(kk <= Int.MaxValue,
        s"graft: in-window rank $kk exceeds the heap bound — raise accuracy")
      Some(windowDf.orderBy(col("v")).limit(kk.toInt)
        .agg(max(col("v"))).head().getDouble(0))
    }
  }

  /**
   * GROUP-WISE [[exactQuantile]] — the per-group exact ceil(p*n_g)-th
   * smallest, fully distributed (nothing group-count-sized touches the
   * driver). The exact `percentile()` aggregate buffers every value of
   * every group in agg state; here each group's sketch brackets its own
   * answer and only the bracket windows (~8n_g/accuracy rows each) are
   * rank-selected:
   *
   *  1. one groupBy computes n_g and the per-group `percentile_approx`
   *     bracket [vlo_g, vhi_g];
   *  2. one pass (brackets joined back — broadcast while the group
   *     count is modest, shuffled equi-join beyond) counts below_g and
   *     window_g, and groups whose sketch violated its rank contract
   *     fall back to a full-range bracket — exactness is UNCONDITIONAL;
   *  3. the bracket-window rows take a per-group sort (row_number over
   *     groups — each window is small by construction) and the row at
   *     in-window rank r_g - below_g is the answer.
   *
   * Returns (groupCols..., q) — groups with only null values are
   * absent (count(col) semantics, like the global form), and rows with
   * a NULL group key are EXCLUDED up front (the bracket join-back is
   * null-unsafe; pre-coalesce keys if you need a null bucket).
   */
  def groupQuantile(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Double, accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "graft: no group columns")
    require(p > 0.0 && p <= 1.0, s"graft: p $p outside (0, 1]")
    require(accuracy >= 100, s"graft: accuracy $accuracy < 100")
    val g = groupCols.map(col)
    val src = df.select((g :+ col(valueCol).cast("double").as("__v")): _*)
      .where(col("__v").isNotNull)
      .where(groupCols.map(c => col(c).isNotNull).reduce(_ && _))
      .localCheckpoint(eager = false)
    val plo = math.max(0.0, p - 4.0 / accuracy)
    val phi = math.min(1.0, p + 4.0 / accuracy)
    val brackets = src.groupBy(g: _*).agg(
      count(lit(1)).as("__n"),
      expr(s"percentile_approx(__v, array($plo, $phi), $accuracy)").as("__b"))
      .select((g ++ Seq(col("__n"),
        ceil(lit(p) * col("__n")).cast("long").as("__r"),
        col("__b").getItem(0).as("__vlo"), col("__b").getItem(1).as("__vhi"))): _*)
    val counted = src.join(brackets, groupCols)
      .groupBy(g: _*).agg(
        sum(when(col("__v") < col("__vlo"), 1L).otherwise(0L)).as("__below"),
        sum(when(col("__v") >= col("__vlo") && col("__v") <= col("__vhi"), 1L)
          .otherwise(0L)).as("__win"))
    // per-group guard: a violated sketch contract widens THAT group's
    // bracket to the full range (rank r_g, below 0) — never wrong,
    // only slower for the violating group
    val finalBrackets = brackets.join(counted, groupCols)
      .withColumn("__ok",
        col("__r") - col("__below") >= 1L && col("__r") - col("__below") <= col("__win"))
      .select((g ++ Seq(
        when(col("__ok"), col("__vlo")).otherwise(lit(Double.NegativeInfinity)).as("__vlo"),
        when(col("__ok"), col("__vhi")).otherwise(lit(Double.PositiveInfinity)).as("__vhi"),
        when(col("__ok"), col("__r") - col("__below")).otherwise(col("__r")).as("__k"))): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__v"))
    src.join(finalBrackets, groupCols)
      .where(col("__v") >= col("__vlo") && col("__v") <= col("__vhi"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === col("__k"))
      .select((g :+ col("__v").as("q")): _*)
  }

  /**
   * Robust per-group outliers via MEDIAN ABSOLUTE DEVIATION: flag rows
   * where |v - median_g(v)| > k * median_g(|v - median_g(v)|). The
   * mean/stddev z-score (EventOps.anomalousHours) moves WITH the
   * outliers it is hunting — one huge spike inflates sigma and masks
   * the rest (masking); the median/MAD pair has a 50% breakdown point,
   * the textbook robust alternative.
   *
   * Both medians are EXACT ([[groupQuantile]]'s bracketed two-pass rank
   * select — the rank-ceil(n/2) element, an actual data value). On an
   * integral `valueCol` every quantity here is an integer-valued
   * double, so the flag set is bit-identical across engines. The two
   * median tables are group-sized and broadcast back; the data makes
   * two quantile passes and two broadcast joins, nothing else.
   *
   * Returns the flagged rows: groupCols..., input columns, plus
   * `med`, `mad`, `dev`.
   */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Double = 3.0): DataFrame = {
    require(k > 0.0, s"graft: k $k must be positive")
    val med = groupQuantile(df, groupCols, valueCol, 0.5)
      .withColumnRenamed("q", "med")
    val d = df.join(broadcast(med), groupCols)
      .withColumn("dev", abs(col(valueCol).cast("double") - col("med")))
    val mad = groupQuantile(d, groupCols, "dev", 0.5)
      .withColumnRenamed("q", "mad")
    d.join(broadcast(mad), groupCols)
      .where(col("dev") > lit(k) * col("mad"))
  }

  /**
   * Key-SKEW profile: the diagnostic a 100 TB pipeline runs before
   * deciding how to join on a key — the top-`topK` heaviest keys with
   * their exact counts and two integer skew measures:
   *
   *  - `share_ppm`  = n * 1e6 div n_rows — the key's share of all rows
   *  - `skew_x1000` = n * n_keys * 1000 div n_rows — the key's count
   *    relative to a perfectly uniform key (1000 = uniform); this is
   *    the replication factor a salted join of this key needs
   *
   * Both are integer divisions of exact longs, so the profile is
   * bit-identical on any engine. The shape: one map-side-combinable
   * `groupBy(key).count()` (the exchange carries distinct keys, not
   * rows), pinned with a lazy localCheckpoint because two consumers
   * read it (the 1-row global stats and the top-k heap); the top-k is
   * a TakeOrderedAndProject (per-partition heaps + driver merge of
   * k·P candidates), never a global sort of the key spectrum. NULL
   * keys are profiled as their own group — at 100 TB a null-heavy key
   * column is precisely the skew you need to see.
   *
   * Feed the result's keys straight into [[Bucketing.saltedJoin]]'s
   * `hotKeys` (a key qualifies when `skew_x1000` is large and `n` is
   * bigger than a broadcast would tolerate).
   *
   * Caveat: `n * n_keys` must fit a long — true until a single key
   * holds ~2^63 / n_keys rows, far past any profiled table.
   */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    require(topK > 0 && topK <= 100000, s"graft: topK $topK outside (0, 1e5]")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val stats = counts.agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(stats))
      .select(col(keyCol), col("n"), col("n_rows"), col("n_keys"),
        expr("n * 1000000 div n_rows").as("share_ppm"),
        expr("n * n_keys * 1000 div n_rows").as("skew_x1000"))
      .orderBy(desc("n"), col(keyCol))
      .limit(topK)
  }
}
