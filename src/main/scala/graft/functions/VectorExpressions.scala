package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector kernels of the engine.
 *
 * Semantics derive from the reference implementation's similarity kernels
 * (reference: src/similarity.rs:1-43) and scalar-quantization codec
 * (reference: src/packed_vector.rs:11-35), re-expressed as codegen-friendly
 * Spark expressions over ARRAY<FLOAT> columns. Accumulation is DOUBLE
 * (the reference uses f32; we deliberately use f64 for cluster-scale
 * numerical stability and oracle parity — documented divergence).
 *
 * All kernels iterate arrays in index order, so results are bit-identical
 * across engines that fold sequentially (e.g. DuckDB list_sum), which is
 * what makes exact-hash oracle comparison possible.
 */
object kernels {

  /** Shared eval helpers. */
  @inline private[functions] def requireSameDim(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"graft: vector dimension mismatch (${n} vs ${y.numElements()})")
    }
    n
  }
}

/** cosine(a, b) = dot(a,b) / (|a|*|b|); NaN when either norm is zero
  * (reference panics on NaN at compare time — we surface NaN and let
  * callers filter; see SURVEY.md §2 parity note (d)). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = kernels.requireSameDim(x, y)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (java.lang.Math.sqrt(nx) * java.lang.Math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException("graft: vector dimension mismatch");
         |}
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = (double) $x.getFloat($i);
         |  final double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** euclidean(a, b) = sqrt(sum((a_i - b_i)^2)). Reference:
  * src/similarity.rs:26-43. Higher = farther (callers negate for
  * "higher is better" top-k ordering; we fix the reference's
  * projected-mode ordering quirk — SURVEY.md §2 #15). */
case class EuclideanDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_euclidean"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = kernels.requireSameDim(x, y)
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d; i += 1
    }
    java.lang.Math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException("graft: vector dimension mismatch");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) — building block for IVF / LSH bucketing. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = kernels.requireSameDim(x, y)
    var s = 0.0; var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException("graft: vector dimension mismatch");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** f32-parity cosine: accumulates in FLOAT exactly like the reference
  * (src/similarity.rs:10-23 — f32 dot / (f32 norm * f32 norm)). The
  * default kernels accumulate in f64 for cluster-scale stability
  * (documented divergence, header above); this variant exists to close
  * the last bit-compat gap when reproducing reference outputs. */
case class CosineSimilarityF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = FloatType
  override def prettyName: String = "graft_cosine_f32"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = kernels.requireSameDim(x, y)
    var dot = 0.0f; var nx = 0.0f; var ny = 0.0f; var i = 0
    while (i < n) {
      val xi = x.getFloat(i); val yi = y.getFloat(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (java.lang.Math.sqrt(nx.toDouble).toFloat * java.lang.Math.sqrt(ny.toDouble).toFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException("graft: vector dimension mismatch");
         |}
         |float $dot = 0.0f, $nx = 0.0f, $ny = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  final float $xi = $x.getFloat($i);
         |  final float $yi = $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / ((float) java.lang.Math.sqrt((double) $nx)
         |  * (float) java.lang.Math.sqrt((double) $ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** f32-parity euclidean (reference src/similarity.rs:26-43). */
case class EuclideanDistanceF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = FloatType
  override def prettyName: String = "graft_euclidean_f32"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = kernels.requireSameDim(x, y)
    var s = 0.0f; var i = 0
    while (i < n) {
      val d = x.getFloat(i) - y.getFloat(i); s += d * d; i += 1
    }
    java.lang.Math.sqrt(s.toDouble).toFloat
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException("graft: vector dimension mismatch");
         |}
         |float $s = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  final float $d = $x.getFloat($i) - $y.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = (float) java.lang.Math.sqrt((double) $s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PackedVectorType {
  /** struct<data: binary, vmin: float, vmax: float> — the quantized codec
    * shape (reference: src/packed_vector.rs:4-8). */
  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType, nullable = false),
    StructField("vmin", FloatType, nullable = false),
    StructField("vmax", FloatType, nullable = false)))
}

/** 8-bit min/max scalar quantization: q_i = round((v_i - min)/(max - min) * 255),
  * clamped to [0, 255]; constant vectors quantize to all-zero bytes.
  * Reference: src/packed_vector.rs:11-25. 4x storage reduction; at 100 TB
  * this is the difference between scanning 100 TB and 25 TB per query. */
case class PackVector(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got $t")
  }
  override def dataType: DataType = PackedVectorType.schema
  override def prettyName: String = "graft_pack"

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mn = Float.PositiveInfinity; var mx = Float.NegativeInfinity
    var i = 0
    while (i < n) { val v = x.getFloat(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
    if (n == 0) { mn = 0f; mx = 0f }
    val range = mx.toDouble - mn.toDouble
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val q =
        if (range == 0.0) 0L
        else {
          val r = java.lang.Math.round((x.getFloat(i).toDouble - mn.toDouble) / range * 255.0)
          if (r < 0L) 0L else if (r > 255L) 255L else r
        }
      bytes(i) = q.toByte
      i += 1
    }
    InternalRow(bytes, mn, mx)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[PackVector]]: v_i = min + q_i/255 * (max - min).
  * Reference: src/packed_vector.rs:27-35. */
case class UnpackVector(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 3 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects struct<data:binary,vmin:float,vmax:float>, got $t")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_unpack"

  protected override def nullSafeEval(a: Any): Any = {
    val row = a.asInstanceOf[InternalRow]
    val bytes = row.getBinary(0)
    val mn = row.getFloat(1).toDouble
    val mx = row.getFloat(2).toDouble
    val range = mx - mn
    val out = new Array[Float](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val q = bytes(i) & 0xff
      out(i) = (mn + q.toDouble / 255.0 * range).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sum of the unsigned quantized bytes of a packed vector — an
  * integer-valued checksum used by the correctness oracle (integers hash
  * identically across engines; floats need not). */
case class PackedByteSum(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 3 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects struct<data:binary,vmin:float,vmax:float>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_packed_byte_sum"

  protected override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[InternalRow].getBinary(0)
    var s = 0L; var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff).toLong; i += 1 }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fusion of cosine(unpack(packed), query): dequantizes element-wise in
  * registers instead of materializing the float array — same bits as the
  * unfused pipeline (each element passes through the identical
  * FLOAT rounding), one less allocation per row on the scan hot path.
  * Installed by the [[graft.functions.FuseQuantizedKernels]] optimizer
  * rule; never user-facing. */
case class CosineOnPacked(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (s: StructType, ArrayType(FloatType, _)) if s.length == 3 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (packed struct, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_packed"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val row = a.asInstanceOf[InternalRow]
    val bytes = row.getBinary(0)
    val mn = row.getFloat(1).toDouble
    val range = row.getFloat(2).toDouble - mn
    val y = b.asInstanceOf[ArrayData]
    val n = bytes.length
    require(y.numElements() == n, "graft: vector dimension mismatch")
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      // identical rounding to UnpackVector: double math -> FLOAT -> double
      val xi = (mn + (bytes(i) & 0xff).toDouble / 255.0 * range).toFloat.toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (java.lang.Math.sqrt(nx) * java.lang.Math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val bytes = ctx.freshName("bytes"); val mn = ctx.freshName("mn")
      val range = ctx.freshName("range")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |final byte[] $bytes = $p.getBinary(0);
         |final double $mn = (double) $p.getFloat(1);
         |final double $range = (double) $p.getFloat(2) - $mn;
         |final int $n = $bytes.length;
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException("graft: vector dimension mismatch");
         |}
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = (double) (float) ($mn + (double) ($bytes[$i] & 0xff) / 255.0 * $range);
         |  final double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fusion of euclidean(unpack(packed), query): dequantizes element-wise
  * in registers — the projected+quantized `searchAuto` hot path
  * (reference scores packed bytes after WASM auto-projection,
  * src/db.rs:233-255 + src/packed_vector.rs:37-54). Same bits as the
  * unfused pipeline. Installed by [[graft.functions.FuseQuantizedKernels]];
  * never user-facing. */
case class EuclideanOnPacked(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (s: StructType, ArrayType(FloatType, _)) if s.length == 3 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (packed struct, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_euclidean_packed"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val row = a.asInstanceOf[InternalRow]
    val bytes = row.getBinary(0)
    val mn = row.getFloat(1).toDouble
    val range = row.getFloat(2).toDouble - mn
    val y = b.asInstanceOf[ArrayData]
    val n = bytes.length
    require(y.numElements() == n, "graft: vector dimension mismatch")
    var s = 0.0; var i = 0
    while (i < n) {
      // identical rounding to UnpackVector: double math -> FLOAT -> double
      val xi = (mn + (bytes(i) & 0xff).toDouble / 255.0 * range).toFloat.toDouble
      val d = xi - y.getFloat(i).toDouble
      s += d * d; i += 1
    }
    java.lang.Math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val bytes = ctx.freshName("bytes"); val mn = ctx.freshName("mn")
      val range = ctx.freshName("range")
      val s = ctx.freshName("s"); val xi = ctx.freshName("xi")
      val d = ctx.freshName("d")
      s"""
         |final byte[] $bytes = $p.getBinary(0);
         |final double $mn = (double) $p.getFloat(1);
         |final double $range = (double) $p.getFloat(2) - $mn;
         |final int $n = $bytes.length;
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException("graft: vector dimension mismatch");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = (double) (float) ($mn + (double) ($bytes[$i] & 0xff) / 255.0 * $range);
         |  final double $d = $xi - (double) $y.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PCA projection: out_j = sum_i (v_i - means_i) * basis_i_j.
  * Basis/means are plan-time constants (small d x k driver-side matrix,
  * broadcast with the serialized expression — no join, no shuffle).
  * Reference pipeline: src/decomposition.rs:88-102, src/db.rs:456-471.
  * We center with GLOBAL means everywhere (the reference re-centers
  * per-file on rewrite, src/db.rs:320 — documented divergence/fix). */
case class ProjectVector(child: Expression, basis: Array[Array[Double]], means: Array[Double])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_project"

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = x.numElements()
    require(d == means.length, s"graft: projection dim mismatch ($d vs ${means.length})")
    val k = if (basis.isEmpty) 0 else basis(0).length
    val centered = new Array[Double](d)
    var i = 0
    while (i < d) { centered(i) = x.getFloat(i).toDouble - means(i); i += 1 }
    val out = new Array[Float](k)
    var j = 0
    while (j < k) {
      var s = 0.0; i = 0
      while (i < d) { s += centered(i) * basis(i)(j); i += 1 }
      out(j) = s.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
