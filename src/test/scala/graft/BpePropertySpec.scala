package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BpeKernel, WordpieceKernel}

/** Property-based invariants of the tokenizer kernels, on the raw JVM
  * kernels (no Spark session — hundreds of deterministic cases per
  * property via seeded scalacheck Gens; the scalatest-scalacheck
  * bridge is not in the offline cache, so the drive loop is explicit):
  *
  *  - a BPE merge pass preserves CONTENT exactly (the concatenation of
  *    symbols is unchanged) and leaves no adjacent occurrence of the
  *    merged pair;
  *  - greedy segmentation reconstructs the word exactly, emits only
  *    vocab pieces or single-char fallbacks, and is maximal at every
  *    position (no longer vocab piece matched where a shorter or
  *    fallback one was taken).
  */
class BpePropertySpec extends AnyFunSuite {

  private def arr(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(s => UTF8String.fromString(s): Any).toArray)

  private def strs(a: ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  private val params = Gen.Parameters.default
  private def cases[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).map(i => g.pureApply(params, Seed(42L + i)))

  private val sym: Gen[String] = Gen.choose(1, 2).flatMap(n =>
    Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  private val symArray: Gen[List[String]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, sym))

  test("merge pass preserves content and eliminates the pair") {
    for (((xs, a), b) <- cases(Gen.zip(Gen.zip(symArray, sym), sym)).map(t => (t._1, t._2))) {
      val out = strs(BpeKernel.mergeAdjacent(arr(xs), UTF8String.fromString(a),
        UTF8String.fromString(b)))
      assert(out.mkString == xs.mkString, s"content changed: $xs + ($a,$b) -> $out")
      assert(!out.zip(out.drop(1)).contains((a, b)), s"pair survived: $xs -> $out")
      assert(out.size <= xs.size)
    }
  }

  test("adjacent pairs: exactly n-1, in input order") {
    for (xs <- cases(symArray)) {
      val p = BpeKernel.adjacentPairs(arr(xs))
      assert(p.numElements() == math.max(0, xs.size - 1))
    }
  }

  private val word: Gen[String] = Gen.choose(0, 10).flatMap(n =>
    Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c', 'd')))
  private val piece: Gen[String] = Gen.choose(1, 4).flatMap(n =>
    Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  private val vocabGen: Gen[Set[String]] = Gen.listOfN(8, piece).map(_.toSet)

  test("optimal count: <= greedy, >= the piece-length floor, 0 only on empty") {
    import graft.functions.{OptimalSegmentKernel, WordpieceKernel}
    for ((w, vocab) <- cases(Gen.zip(word, vocabGen), n = 500)) {
      val set = new java.util.HashSet[String]()
      vocab.foreach(set.add)
      val maxLen = (vocab.map(_.length) + 1).max
      val g = WordpieceKernel.greedySegment(
        UTF8String.fromString(w), set, maxLen).numElements()
      val o = OptimalSegmentKernel.optimalCount(
        UTF8String.fromString(w), set, maxLen)
      assert(o <= g, s"optimal $o > greedy $g for '$w' (vocab $vocab)")
      assert(o >= (w.length + maxLen - 1) / maxLen,
        s"optimal $o below the floor for '$w'")
      assert((o == 0) == w.isEmpty)
    }
  }

  test("greedy segmentation: exact reconstruction, vocab membership, maximality") {
    for ((w, vocab) <- cases(Gen.zip(word, vocabGen), n = 500)) {
      val set = new java.util.HashSet[String]()
      vocab.foreach(set.add)
      val maxLen = (vocab.map(_.length) + 1).max
      val segs = strs(WordpieceKernel.greedySegment(
        UTF8String.fromString(w), set, maxLen))
      assert(segs.mkString == w, s"reconstruction failed: '$w' -> $segs")
      assert(segs.forall(p => vocab.contains(p) || p.length == 1))
      var pos = 0
      for (p <- segs) {
        // maximality: no LONGER vocab piece matched at this position
        for (l <- p.length + 1 to math.min(maxLen, w.length - pos))
          assert(!vocab.contains(w.substring(pos, pos + l)),
            s"non-maximal pick '$p' at $pos in '$w' (vocab $vocab)")
        // a fallback char is only legal when NOTHING matched here
        if (!vocab.contains(p))
          for (l <- 1 to math.min(maxLen, w.length - pos))
            assert(!vocab.contains(w.substring(pos, pos + l)))
        pos += p.length
      }
    }
  }
}
