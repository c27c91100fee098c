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
  def sortedPairs(items: ArrayData): ArrayData = {
    val n = items.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      // getLong on a null slot silently reads 0L — raise instead
      // (ADVICE r13 #3; no legitimate producer emits null items)
      if (items.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_pairs: null element at index $i")
      val a = items.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(a, items.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_pairs(array<bigint>) -> ARRAY<STRUCT<a: BIGINT, b: BIGINT>>
  * of all index-ordered pairs (i < j). On a SORTED input array the
  * pairs are value-ordered, matching the `x.pk < y.pk` self-join form
  * the oracle SQL keeps. */
case class SortedPairs(child: Expression) extends UnaryExpression {
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
    PairKernel.sortedPairs(items.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, items =>
      s"${ev.value} = graft.functions.PairKernel.sortedPairs($items);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
