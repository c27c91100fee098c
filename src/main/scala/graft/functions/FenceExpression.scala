package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/**
 * Identity PUSHDOWN FENCE: evaluates to its child unchanged, but is
 * declared non-deterministic so Catalyst will not substitute it into
 * other operators — in particular, `PushPredicateThroughNonJoin`
 * refuses to push a Filter through a Project whose fields are not all
 * deterministic.
 *
 * Why this exists (r17, found via plans/r17/pipeline_web_after.txt):
 * when an EXPENSIVE derived column (a tokenize chain, a quality score)
 * is filtered on right above the projection that computes it, predicate
 * pushdown inlines the full expression tree into the Filter below —
 * the corpus pays the computation twice (once to decide, once to emit),
 * and per-operator codegen subexpression elimination cannot share
 * across the two operators. A `repartition(...)` "barrier" does NOT
 * stop this (filters push through RepartitionByExpression); marking the
 * projected column non-deterministic does, and is the same mechanism
 * the optimization guide prescribes for expensive UDFs (guide §4.4),
 * applied to a built-in expression tree.
 *
 * The fence is pure pass-through in both eval and codegen (zero runtime
 * cost, no extra projection), never foldable, and intentionally blocks:
 * predicate pushdown through its projection, constant folding, and any
 * rewrite that would duplicate its subtree. Use it ONLY where
 * duplication is the known failure mode — it also blocks pushdowns that
 * would genuinely help (a cheap selective predicate crossing the
 * projection), so fence the expensive columns, not everything.
 */
case class Fence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_fence"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ExprCode(c.code, c.isNull, c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
