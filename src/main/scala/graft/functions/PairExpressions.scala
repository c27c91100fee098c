package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Ordered-pair kernel for basket-shaped co-occurrence queries
 * (market-basket association rules, co-purchase graph edges): all
 * (items(i), items(j)) with i < j from one array, in ONE compiled
 * pass per row.
 *
 * Why an expression and not the HOF form: the
 * `flatten(transform(items, (x,i) -> transform(slice(...), ...)))`
 * Column form runs per element through Spark's higher-order-function
 * interpreter, allocating a sliced array plus a lambda-variable frame
 * per item (the measured ShingleKernel lesson — interpreted HOFs
 * dominated every hot path they appeared in). Here the quadratic-in-k
 * loop (bounded: k = basket width, <= 7 for TPC-H orders) runs as one
 * static JVM kernel inside whole-stage codegen. Output order is
 * (i asc, j asc) — identical to the HOF form, and irrelevant to the
 * downstream groupBy.
 */
object PairKernel {
  /** Baskets truncated by the rank-distance cap in this JVM (executor-
    * local; a cluster aggregates via logs — each executor WARNs on its
    * first truncation and every [[LogEvery]]th after). The NON-opt-in
    * truncation signal (ADVICE r15 #1): [[GraftFunctions
    * .basketOverflow]] is the precise queryable counter, but a caller
    * who doesn't know about the cap would never run it — the kernel
    * itself must say when it drops beyond-cap pairs. */
  val truncatedBaskets = new java.util.concurrent.atomic.LongAdder
  private val LogEvery = 100000L

  /** Pairs within rank distance `cap`: each items(i) pairs with the
    * (up to) `cap` FOLLOWING items. A basket of width w <= cap + 1
    * produces all w(w-1)/2 pairs — bit-identical to the uncapped
    * kernel; a degenerate hot basket produces O(w x cap) rank-chained
    * pairs instead of O(w^2) (the banded-LSH bucket-cap design,
    * [[graft.operators.Dedup.EmbLshBucketCap]]: the blow-up is avoided
    * structurally — one 100k-item basket would otherwise emit 5e9
    * structs in a single task). Truncation is LOUD without opt-in:
    * [[truncatedBaskets]] counts and the executor log WARNs; pair
    * [[GraftFunctions.basketOverflow]] with any capped aggregate for
    * the exact distributed count. */
  def sortedPairs(items: ArrayData, cap: Int): ArrayData = {
    val n = items.numElements()
    if (cap < 1)
      throw new IllegalArgumentException(s"graft_pairs: cap $cap must be >= 1")
    if (n.toLong - 1 > cap) {
      truncatedBaskets.increment()
      val seen = truncatedBaskets.sum()
      if (seen == 1L || seen % LogEvery == 0L)
        System.err.println(s"WARN graft_pairs: basket of $n items exceeds " +
          s"rank-distance cap $cap — beyond-cap pairs are NOT emitted " +
          s"($seen capped baskets so far in this JVM; use " +
          "graft_pairs_capped with a wider cap, or GraftFunctions" +
          ".basketOverflow for the exact count)")
    }
    // exact output length under the rank-distance cap (long math: the
    // uncapped n*(n-1)/2 overflows Int at n ~ 2^16.5)
    val len: Long =
      if (n.toLong - 1 <= cap) n.toLong * (n - 1) / 2
      else (n.toLong - cap) * cap + cap.toLong * (cap - 1) / 2
    if (len > Int.MaxValue - 8)
      throw new IllegalArgumentException(
        s"graft_pairs: basket of $n items emits $len pairs even rank-capped at $cap — lower the cap")
    val out = new Array[Any](len.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      // getLong on a null slot silently reads 0L — raise instead
      // (ADVICE r13 #3; no legitimate producer emits null items)
      if (items.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_pairs: null element at index $i")
      val a = items.getLong(i)
      val jEnd = math.min(n.toLong, i.toLong + 1 + cap).toInt
      var j = i + 1
      while (j < jEnd) {
        out(k) = InternalRow(a, items.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[sortedPairs]] with each pair PACKED into one long
    * (`a << 32 | b`) and the output a PRIMITIVE long array
    * (`UnsafeArrayData.fromPrimitiveArray` — no per-pair struct or
    * boxing; r17, the q_assoc_rules shuffle-key rewrite). Valid only
    * while every item id fits in an unsigned 32-bit slot — ids outside
    * that range RAISE (use `graft_pairs` + an explicit struct key for
    * wider dictionaries; silent truncation would merge distinct
    * pairs). Same cap semantics, same truncation counter. */
  def sortedPairsPacked(items: ArrayData, cap: Int): ArrayData = {
    val n = items.numElements()
    if (cap < 1)
      throw new IllegalArgumentException(s"graft_pairs: cap $cap must be >= 1")
    if (n.toLong - 1 > cap) {
      truncatedBaskets.increment()
      val seen = truncatedBaskets.sum()
      if (seen == 1L || seen % LogEvery == 0L)
        System.err.println(s"WARN graft_pairs_packed: basket of $n items " +
          s"exceeds rank-distance cap $cap — beyond-cap pairs are NOT " +
          s"emitted ($seen capped baskets so far in this JVM)")
    }
    val len: Long =
      if (n.toLong - 1 <= cap) n.toLong * (n - 1) / 2
      else (n.toLong - cap) * cap + cap.toLong * (cap - 1) / 2
    if (len > Int.MaxValue - 8)
      throw new IllegalArgumentException(
        s"graft_pairs_packed: basket of $n items emits $len pairs even rank-capped at $cap — lower the cap")
    val out = new Array[Long](len.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      if (items.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_pairs_packed: null element at index $i")
      val a = items.getLong(i)
      if ((a >>> 32) != 0L)
        throw new IllegalArgumentException(
          s"graft_pairs_packed: item id $a does not fit unsigned 32 bits — use graft_pairs")
      val jEnd = math.min(n.toLong, i.toLong + 1 + cap).toInt
      var j = i + 1
      while (j < jEnd) {
        val b = items.getLong(j)
        if ((b >>> 32) != 0L)
          throw new IllegalArgumentException(
            s"graft_pairs_packed: item id $b does not fit unsigned 32 bits — use graft_pairs")
        out(k) = (a << 32) | b
        k += 1
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

object SortedPairs {
  /** Default rank-distance cap (VERDICT r14 #3): far above any organic
    * basket (TPC-H orders <= 7 items; organic co-occurrence baskets
    * are tens), a hard ceiling on what one power-law row can emit —
    * 10^5-item boilerplate basket: 25.6M chained pairs, not 5e9. */
  val DefaultCap = 256
}

/** graft_pairs(array<bigint>) -> ARRAY<STRUCT<a: BIGINT, b: BIGINT>>
  * of index-ordered pairs (i < j) within rank distance `cap` (all
  * pairs for baskets <= cap + 1 wide — see [[PairKernel.sortedPairs]]).
  * On a SORTED input array the pairs are value-ordered, matching the
  * `x.pk < y.pk` self-join form the oracle SQL keeps. */
case class SortedPairs(child: Expression,
                       cap: Int = SortedPairs.DefaultCap) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pairs"

  // containsNull = true is ACCEPTED at analysis time (encoders and
  // parquet scans declare it for any Seq column regardless of data);
  // actual null elements raise inside the kernel (ADVICE r13 #3 — they
  // previously read as a silent 0L in an emitted pair).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got $t")
  }

  protected override def nullSafeEval(items: Any): Any =
    PairKernel.sortedPairs(items.asInstanceOf[ArrayData], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, items =>
      s"${ev.value} = graft.functions.PairKernel.sortedPairs($items, $cap);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_pairs_packed(array<bigint>) -> ARRAY<BIGINT> of index-ordered
  * pairs packed `a << 32 | b` within rank distance `cap` — the
  * shuffle-key form of [[SortedPairs]]: one primitive long per pair
  * (no struct, no boxing), decoded by `shiftright`/`& 0xffffffff`
  * AFTER the aggregation filter. RAISES on ids outside unsigned
  * 32 bits (see [[PairKernel.sortedPairsPacked]]). */
case class SortedPairsPacked(child: Expression,
                             cap: Int = SortedPairs.DefaultCap) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pairs_packed"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got $t")
  }

  protected override def nullSafeEval(items: Any): Any =
    PairKernel.sortedPairsPacked(items.asInstanceOf[ArrayData], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, items =>
      s"${ev.value} = graft.functions.PairKernel.sortedPairsPacked($items, $cap);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
