package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/**
 * Count-Min-Sketch probe kernel for the heavy-hitters operator.
 *
 * The sketch is BUILT by Spark's own `count_min_sketch` aggregate (one
 * pass, map-side mergeable partials); what Spark lacks is the probe
 * side — an expression that asks "is this row's key a candidate heavy
 * hitter?" against the finished sketch. This expression carries the
 * serialized sketch as a foldable binary literal, deserializes it ONCE
 * at plan time, and ships the decoded `CountMinSketch` to executors as
 * a task constant (`addReferenceObj`, the TermCounts discipline), so
 * the per-row work is the d murmur probes and nothing else, inside
 * whole-stage codegen.
 *
 * Hash compatibility is by construction, not by reimplementation: keys
 * probe via `estimateCount(byte[])` on the SAME UTF-8 bytes
 * (`UTF8String.getBytes`) that `CountMinSketchAgg` added, so the probe
 * and the build can never drift even across Spark versions.
 */
object SketchKernel {
  /** CMS point estimate for a UTF-8 string key. Never underestimates —
    * the heavy-hitter candidate filter inherits zero false negatives. */
  def cmsEstimate(key: UTF8String, cms: CountMinSketch): Long =
    cms.estimateCount(key.getBytes)
}

/** `graft_cms_estimate(key, sketchBytes)` — per-row CMS count estimate.
  * `sketchBytes` must be a foldable binary (the output of a
  * `count_min_sketch` aggregate collected to the driver). */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, BinaryType) if right.foldable =>
        right.eval() match {
          case null => TypeCheckResult.TypeCheckFailure(
            s"$prettyName needs a non-null sketch")
          case b: Array[Byte] =>
            try { CountMinSketch.readFrom(b); TypeCheckResult.TypeCheckSuccess }
            catch { case e: Exception => TypeCheckResult.TypeCheckFailure(
              s"$prettyName sketch bytes do not deserialize: ${e.getMessage}") }
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string key, binary literal sketch), got ($l, $r)")
    }

  /** Decoded once at plan time; shipped as a task constant. */
  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(right.eval().asInstanceOf[Array[Byte]])

  protected override def nullSafeEval(k: Any, s: Any): Any =
    SketchKernel.cmsEstimate(k.asInstanceOf[UTF8String], cms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmsRef = ctx.addReferenceObj("graftCms", cms,
      "org.apache.spark.util.sketch.CountMinSketch")
    nullSafeCodeGen(ctx, ev, (k, _) =>
      s"${ev.value} = graft.functions.SketchKernel.cmsEstimate($k, $cmsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_bloom_contains(key, bloomBytes)` — per-row Bloom-filter
  * membership probe against a driver-built filter (the output of
  * `DataFrame.stat.bloomFilter`, serialized). Key may be BIGINT (probed
  * via `mightContainLong`, the route `stat.bloomFilter` used to insert
  * longs) or STRING (probed via the UTF-8 bytes it inserted) — same
  * hash routes as the build, so "no false negatives" holds by
  * construction and a semi-join pre-filter can never drop a real match.
  */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | _: StringType, BinaryType) if right.foldable =>
        right.eval() match {
          case null => TypeCheckResult.TypeCheckFailure(
            s"$prettyName needs a non-null bloom filter")
          case b: Array[Byte] =>
            try { BloomFilter.readFrom(b); TypeCheckResult.TypeCheckSuccess }
            catch { case e: Exception => TypeCheckResult.TypeCheckFailure(
              s"$prettyName bloom bytes do not deserialize: ${e.getMessage}") }
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint|string key, binary literal bloom), got ($l, $r)")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(right.eval().asInstanceOf[Array[Byte]])

  private def isLongKey = left.dataType == LongType

  protected override def nullSafeEval(k: Any, s: Any): Any =
    if (isLongKey) bloom.mightContainLong(k.asInstanceOf[Long])
    else bloom.mightContainBinary(k.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, (k, _) =>
      if (isLongKey) s"${ev.value} = $ref.mightContainLong($k);"
      else s"${ev.value} = $ref.mightContainBinary($k.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
