package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Compiled kernels for byte-pair-encoding merge training
 * (Gage 1994; Sennrich et al. 2016, "Neural Machine Translation of
 * Rare Words with Subword Units") over a distributed word-frequency
 * dictionary — see [[graft.operators.Bpe]].
 *
 * Three tiny per-row loops that would otherwise run through Spark's
 * interpreted higher-order-function evaluator (the measured
 * ShingleKernel lesson — an interpreted lambda frame per array element
 * dominates every hot path it appears in):
 *
 *  - `chars`: word -> its single-character symbol array (the BPE
 *    initial state). Also sidesteps the `split(col, "")` trailing
 *    empty-string ambiguity entirely.
 *  - `adjacentPairs`: symbol array -> all adjacent (a, b) symbol
 *    pairs, one compiled pass (the per-iteration count input).
 *  - `mergeAdjacent`: one LEFT-TO-RIGHT, NON-OVERLAPPING merge pass:
 *    every adjacent (a, b) occurrence becomes the single symbol a+b,
 *    and a merged token is NOT re-considered as the left end of a
 *    following match ("a a a" under (a,a) -> "aa a", not "aa aa" or
 *    "a aa"). This is the classic BPE apply order, and it is exactly
 *    the semantics of a literal string `replace()` over a
 *    delimiter-guarded rendering — which is what the DuckDB oracle
 *    runs (empirically pinned: '|a| |a| |a| |a|' -> '|aa| |aa|',
 *    '|a| |a| |a|' -> '|aa| |a|').
 */
object BpeKernel {
  def chars(word: UTF8String): ArrayData = {
    val n = word.numChars()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = word.substring(i, i + 1)
      i += 1
    }
    new GenericArrayData(out)
  }

  // a null slot read via getUTF8String lands a null in a struct/array
  // declared containsNull = false (ADVICE r13 #3) — raise instead; the
  // ACCEPTED input type keeps containsNull = true because encoders and
  // parquet scans declare it for every Seq column regardless of data
  private def nonNull(syms: ArrayData, i: Int, kernel: String): Unit =
    if (syms.isNullAt(i))
      throw new IllegalArgumentException(s"$kernel: null element at index $i")

  def adjacentPairs(syms: ArrayData): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      nonNull(syms, i, "graft_adj_pairs")
      nonNull(syms, i + 1, "graft_adj_pairs")
      out(i) = InternalRow(syms.getUTF8String(i), syms.getUTF8String(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  def mergeAdjacent(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      nonNull(syms, i, "graft_merge_pair")
      // the lookahead slot is read unguarded by the match below; a
      // merged i+1 is otherwise never revisited as i
      if (i + 1 < n) nonNull(syms, i + 1, "graft_merge_pair")
      if (i + 1 < n && syms.getUTF8String(i).equals(a)
          && syms.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(syms.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

object WordpieceKernel {
  /** Greedy longest-match-first segmentation (the WordPiece/MaxMatch
    * inference rule, Wu et al. 2016 arXiv:1609.08144 §4.1): at each
    * position take the LONGEST vocab piece matching, else consume one
    * character as an unknown piece (single-char fallback keeps the scan
    * total — no <unk> collapse, so token counts stay exact). */
  def greedySegment(word: UTF8String, pieces: java.util.HashSet[String],
                    maxLen: Int): ArrayData = {
    // positions are CODE POINTS (UTF8String.numChars/substring), the
    // same unit as the sibling chars() kernel — a UTF-16 String.length
    // walk would split surrogate pairs on non-BMP input, emitting
    // lone-surrogate pieces and inflating counts
    val n = word.numChars()
    val out = new java.util.ArrayList[Any](n)
    var pos = 0
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var found = 1
      var done = false
      while (l >= 1 && !done) {
        if (pieces.contains(word.substring(pos, pos + l).toString)) {
          found = l; done = true
        }
        l -= 1
      }
      out.add(word.substring(pos, pos + found))
      pos += found
    }
    new GenericArrayData(out.toArray)
  }
}

object OptimalSegmentKernel {
  /** Minimum-token segmentation count — the Viterbi-style DP the
    * unigram-LM tokenizer family runs (Kudo 2018 arXiv:1804.10959,
    * with unit costs: count-only keeps the objective integer-exact and
    * tie-free — the MIN is unique even when paths tie). dp(i) = min
    * tokens covering the first i code points; transitions are vocab
    * pieces ending at i, plus the always-available single-char
    * fallback (cost 1) so every word segments. Greedy longest-match
    * ([[WordpieceKernel]]) is NOT optimal ("abc" over {ab, a, bc}:
    * greedy 2+fallback=2 vs optimal a+bc=2 ... e.g. {abc-less vocab}
    * cases diverge — spec-pinned); this kernel is the exact bound. */
  def optimalCount(word: UTF8String, pieces: java.util.HashSet[String],
                   maxLen: Int): Int = {
    val n = word.numChars()
    if (n == 0) return 0
    val dp = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = dp(i - 1) + 1 // single-char fallback
      var l = 2
      val lmax = math.min(maxLen, i)
      while (l <= lmax) {
        if (pieces.contains(word.substring(i - l, i).toString)
            && dp(i - l) + 1 < best)
          best = dp(i - l) + 1
        l += 1
      }
      dp(i) = best
      i += 1
    }
    dp(n)
  }
}

/** graft_optimal_segment_count(word, pieces) -> INT: minimum token
  * count under the piece vocabulary (plan-constant, same validation
  * and shipping discipline as [[GreedySegment]]). */
case class OptimalSegmentCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_optimal_segment_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        right.eval() match {
          case null => TypeCheckResult.TypeCheckFailure(
            s"$prettyName needs a non-null pieces array")
          case a: ArrayData =>
            if (a.numElements() == 0)
              TypeCheckResult.TypeCheckFailure(
                s"$prettyName needs at least one piece")
            else if ((0 until a.numElements()).exists(i =>
                a.isNullAt(i) || a.getUTF8String(i).numChars() == 0))
              TypeCheckResult.TypeCheckFailure(
                s"$prettyName pieces must be non-null, non-empty")
            else TypeCheckResult.TypeCheckSuccess
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, array<string> literal pieces), got ($l, $r)")
    }

  @transient private lazy val pieceSet: java.util.HashSet[String] = {
    val a = right.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { s.add(a.getUTF8String(i).toString); i += 1 }
    s
  }

  @transient private lazy val maxPieceLen: Int = {
    val it = pieceSet.iterator()
    var m = 1
    while (it.hasNext) m = math.max(m, it.next().length)
    m
  }

  protected override def nullSafeEval(w: Any, ps: Any): Any =
    OptimalSegmentKernel.optimalCount(
      w.asInstanceOf[UTF8String], pieceSet, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftOptPieceSet", pieceSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.OptimalSegmentKernel.optimalCount($w, $setRef, $maxPieceLen);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_greedy_segment(word, pieces) -> ARRAY<STRING>: greedy
  * longest-match segmentation of `word` against a plan-constant piece
  * vocabulary (validated foldable at analysis; shipped to executors as
  * a task-constant HashSet — the [[TermCounts]] discipline). */
case class GreedySegment(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_greedy_segment"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        right.eval() match {
          case null => TypeCheckResult.TypeCheckFailure(
            s"$prettyName needs a non-null pieces array")
          case a: ArrayData =>
            val n = a.numElements()
            if (n == 0)
              TypeCheckResult.TypeCheckFailure(s"$prettyName needs at least one piece")
            else if ((0 until n).exists(i => a.isNullAt(i) || a.getUTF8String(i).numChars() == 0))
              TypeCheckResult.TypeCheckFailure(s"$prettyName pieces must be non-null, non-empty")
            else TypeCheckResult.TypeCheckSuccess
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, array<string> literal pieces), got ($l, $r)")
    }

  @transient private lazy val pieceSet: java.util.HashSet[String] = {
    val a = right.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { s.add(a.getUTF8String(i).toString); i += 1 }
    s
  }

  @transient private lazy val maxPieceLen: Int = {
    val it = pieceSet.iterator()
    var m = 1
    while (it.hasNext) m = math.max(m, it.next().length)
    m
  }

  protected override def nullSafeEval(w: Any, ps: Any): Any =
    WordpieceKernel.greedySegment(w.asInstanceOf[UTF8String], pieceSet, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftPieceSet", pieceSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.WordpieceKernel.greedySegment($w, $setRef, $maxPieceLen);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_chars(string) -> ARRAY<STRING> of single-character symbols. */
case class CharSymbols(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_chars"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }

  protected override def nullSafeEval(word: Any): Any =
    BpeKernel.chars(word.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, word =>
      s"${ev.value} = graft.functions.BpeKernel.chars($word);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_adj_pairs(array<string>) -> ARRAY<STRUCT<a: STRING, b: STRING>>
  * of adjacent symbol pairs. */
case class AdjacentPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", StringType, nullable = false),
      StructField("b", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_adj_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }

  protected override def nullSafeEval(syms: Any): Any =
    BpeKernel.adjacentPairs(syms.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, syms =>
      s"${ev.value} = graft.functions.BpeKernel.adjacentPairs($syms);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_merge_pair(array<string>, a, b) -> ARRAY<STRING>: one
  * left-to-right non-overlapping merge pass of adjacent (a, b) into
  * a+b. The pair arguments are plan constants (the driver-selected
  * argmax of one training iteration), validated foldable at analysis
  * time so a non-constant can never reach the compiled kernel. */
case class MergeAdjacentPair(child: Expression, left: Expression, right: Expression)
    extends TernaryExpression {
  override def first: Expression = child
  override def second: Expression = left
  override def third: Expression = right

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_merge_pair"

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        if (!left.foldable || !right.foldable)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName merge pair must be constant")
        else TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, string, string), got $t")
    }

  protected override def nullSafeEval(syms: Any, a: Any, b: Any): Any =
    BpeKernel.mergeAdjacent(syms.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (syms, a, b) =>
      s"${ev.value} = graft.functions.BpeKernel.mergeAdjacent($syms, $a, $b);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(child = newFirst, left = newSecond, right = newThird)
}
