package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca
import graft.sources.VictorBin

/** Property-based invariants of the eigen.bin serde (raw JVM, no Spark
  * session; seeded scalacheck Gens with an explicit drive loop — the
  * scalatest-scalacheck bridge is not in the offline cache):
  *
  *  - write -> read round-trips any projection model exactly at f32
  *    precision (values are generated AS f32-representable, so the
  *    round trip is equality, not epsilon);
  *  - the byte length is exactly the closed-form layout size
  *    8 + 4dk + 8 + 8 + 8 + 4d — any framing drift (a dropped length,
  *    a dimension swap) changes it;
  *  - projectOne through the round-tripped model equals projectOne
  *    through the original (the semantic the migration preserves).
  */
class EigenPropertySpec extends AnyFunSuite {

  private val genDim = for {
    d <- Gen.choose(2, 24)
    k <- Gen.choose(1, d - 1)
  } yield (d, k)

  // f32-representable doubles: generate floats, widen
  private val genVal: Gen[Double] =
    Gen.choose(-1000000, 1000000).map(i => (i / 1024.0f).toDouble)

  private def genModel: Gen[Pca.Model] = for {
    (d, k) <- genDim
    flat <- Gen.listOfN(d * k + d, genVal)
  } yield {
    val basis = Array.tabulate(d, k)((i, j) => flat(i * k + j))
    Pca.Model(basis, flat.drop(d * k).toArray)
  }

  private def cases[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("eigen.bin write -> read is exact at f32, with the closed-form byte length") {
    for ((m, i) <- cases(genModel, 200, 0xE16E7L).zipWithIndex) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-eigen-prop-$i")
      VictorBin.writeProjection(dir.toString, m)
      val bytes = java.nio.file.Files.size(dir.resolve("eigen.bin"))
      assert(bytes == 8L + 4L * m.d * m.k + 24L + 4L * m.d,
        s"case $i: layout size drift (d=${m.d}, k=${m.k}, $bytes bytes)")
      val r = VictorBin.readProjection(dir.toString)
      assert(r.d == m.d && r.k == m.k, s"case $i dims")
      assert(r.means.toSeq == m.means.toSeq, s"case $i means")
      assert(r.basis.map(_.toSeq).toSeq == m.basis.map(_.toSeq).toSeq, s"case $i basis")
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.delete(p); () })
    }
  }

  test("projection through the round-tripped model is identical") {
    for ((m, i) <- cases(genModel, 50, 0xCAFEL).zipWithIndex) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-eigen-prj-$i")
      VictorBin.writeProjection(dir.toString, m)
      val r = VictorBin.readProjection(dir.toString)
      val q = cases(Gen.listOfN(m.d, genVal), 1, 7L + i).head.map(_.toFloat)
      assert(Pca.projectOne(r, q).toSeq == Pca.projectOne(m, q).toSeq, s"case $i")
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.delete(p); () })
    }
  }
}
