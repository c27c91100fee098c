package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deletion-neighborhood kernel for the exact edit-distance similarity
 * join (FastSS / SymSpell blocking; Bocek et al., "Fast Similarity
 * Search in Large Dictionaries", 2007).
 *
 * N_d(s) = all strings reachable from s by deleting AT MOST d
 * characters (s itself included). The blocking property: if
 * levenshtein(a, b) <= d then N_d(a) ∩ N_d(b) is non-empty — every
 * edit either touches a position (delete it on the side(s) that carry
 * it) or inserts one (delete it on the inserted side), so the <= d
 * edited positions can be deleted away to a common subsequence.
 * Grouping keys by shared variant therefore yields a candidate
 * SUPERSET; an exact levenshtein verify restores soundness, making the
 * join exact end-to-end.
 *
 * One compiled pass per key (the ShingleKernel discipline): variants
 * are built by index-skipping copies, deduplicated in insertion order
 * (deleting either of a doubled letter yields the same string —
 * "aa" -> "a" once, not twice).
 */
object FuzzyKernel {

  /** Distinct deletion variants of `s` with up to `d` (1 or 2)
    * deletions, `s` itself first. |N_1| <= L+1, |N_2| <= 1+L+C(L,2). */
  def deletionVariants(s: UTF8String, d: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    // insertion-ordered dedupe; sized for the d=1 common case
    val seen = new java.util.LinkedHashSet[String](math.max(8, 2 * n))
    seen.add(str)
    var i = 0
    while (i < n) {
      val del1 = str.substring(0, i) + str.substring(i + 1)
      seen.add(del1)
      if (d >= 2) {
        // second deletion from del1 at positions >= i (positions < i
        // are covered by the symmetric first-deletion order)
        var j = i
        while (j < del1.length) {
          seen.add(del1.substring(0, j) + del1.substring(j + 1))
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** graft_del_variants(str, d) -> ARRAY<STRING> distinct deletion
  * variants of `str` with at most `d` deletions (FastSS blocking keys).
  * `d` must be a foldable 1 or 2 — beyond 2 the neighborhood grows
  * O(L^d) and the right scale tool is a different blocking scheme
  * (validated here, at analysis time, so the SQL surface cannot
  * silently explode). */
case class DeletionVariants(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_del_variants"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) if right.foldable =>
        right.eval() match {
          case d: Integer if d >= 1 && d <= 2 => TypeCheckResult.TypeCheckSuccess
          case d => TypeCheckResult.TypeCheckFailure(
            s"$prettyName needs d in {1, 2}, got $d")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int literal d), got ($l, $r)")
    }

  protected override def nullSafeEval(s: Any, d: Any): Any =
    FuzzyKernel.deletionVariants(s.asInstanceOf[UTF8String], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d) =>
      s"${ev.value} = graft.functions.FuzzyKernel.deletionVariants($s, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
