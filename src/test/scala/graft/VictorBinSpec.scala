package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VictorBin

/** Byte-level victor format: the reference's OWN test vectors pin the
  * codec (src/packed_vector.rs:63-79 serialization size; :81-105
  * round-trip golden cases), round-trip pins the container layout, and
  * the migration test walks the full path into the parquet store. */
class VictorBinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def uuid(i: Int): String =
    new java.util.UUID(0x1111222233334444L + i, 0x5555666677778888L + i).toString

  test("codec byte sizes match the reference's own unit test (1024-dim -> 1040 bytes)") {
    assert(VictorBin.packBytes(Array.fill(1024)(0f)).length == 1040)
    // record = uuid(24) + packed(1040) -> header must say 1064 for d=1024
  }

  test("pack/unpack round-trips the reference's golden cases (zeros, ones, alternating)") {
    def roundTrip(vec: Array[Float]): Seq[Float] = {
      val packed = VictorBin.packBytes(vec)
      // wrap as a single-record db file: header + uuid + packed
      val out = new java.io.ByteArrayOutputStream()
      val rec = new java.io.ByteArrayOutputStream()
      val idb = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      idb.putLong(16L)
      idb.order(java.nio.ByteOrder.BIG_ENDIAN).putLong(1L).putLong(2L)
      rec.write(idb.array()); rec.write(packed, 0, packed.length)
      val h = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      h.putInt(rec.size())
      out.write(h.array()); rec.writeTo(out)
      VictorBin.parseDbFile(out.toByteArray).next()._2.toSeq
    }
    assert(roundTrip(Array.fill(16)(0f)) == Seq.fill(16)(0f))
    assert(roundTrip(Array.fill(16)(1f)) == Seq.fill(16)(1f))
    val alt = (0 until 16).map(i => (i % 2).toFloat)
    assert(roundTrip(alt.toArray) == alt)
  }

  test("round trip: export -> index/embeddings/contents -> identical store") {
    val dir = Files.createTempDirectory("graft-victor").toString
    val rows = Seq(
      (uuid(1), Seq(0.1f, 0.5f, 0.9f), "hello", Seq("en", "web")),
      (uuid(2), Seq(-1f, 0f, 1f), "welt", Seq("de")),
      (uuid(3), Seq(0.25f, 0.5f, 0.75f), "uniçøde ☃", Seq("de")),
      (uuid(4), Seq(1f, 2f, 3f), "untagged", Seq.empty[String]))
      .toDF("id", "vector", "content", "tags")
    VictorBin.export(rows, dir)
    // index carries the three tag sets; filenames are the sha256 rule
    val idx = VictorBin.readIndex(dir).map(_.sorted.toList).toSet
    assert(idx == Set(List("en", "web"), List("de"), List()))
    for (s <- idx)
      assert(new java.io.File(dir, VictorBin.filenameForTags(s)).exists(),
        s"missing db file for $s")
    val back = VictorBin.importStore(spark, dir)
    assert(back.count() == 4)
    val got = back.orderBy("id").collect()
    val want = rows.orderBy("id").collect()
    assert(got.map(_.getString(0)).toSeq == want.map(_.getString(0)).toSeq)
    assert(got.map(_.getString(2)).toSeq == want.map(_.getString(2)).toSeq)
    assert(got.map(_.getSeq[String](3).sorted).toSeq ==
      want.map(_.getSeq[String](3).sorted).toSeq)
    // vectors: 8-bit codec round trip — exact for the quantization
    // grid points, <= half-step error otherwise
    for ((g, w) <- got.zip(want)) {
      val gv = g.getSeq[Float](1); val wv = w.getSeq[Float](1)
      val step = (wv.max - wv.min) / 255.0f
      assert(gv.size == wv.size)
      gv.zip(wv).foreach { case (a, b) => assert(math.abs(a - b) <= step / 2 + 1e-6) }
    }
  }

  test("migration: victor dir -> VectorStore -> tag-filtered search serves the content") {
    val dir = Files.createTempDirectory("graft-victor-mig").toString
    VictorBin.export(Seq(
      (uuid(11), Seq(1f, 0f, 0f), "erste", Seq("de")),
      (uuid(12), Seq(0f, 1f, 0f), "second", Seq("en")))
      .toDF("id", "vector", "content", "tags"), dir)
    val store = new graft.operators.VectorStore(
      spark, Files.createTempDirectory("graft-victor-store").toString)
    store.importVictor(dir)
    val hit = store.search(Seq(1f, 0f, 0f), tags = Seq("de"), k = 1).head()
    assert(hit.getAs[String]("content") == "erste")
    assert(hit.getAs[String]("id") == uuid(11))
    store.clear()
  }

  test("projected victor store (eigen.bin present): importStore refuses, opt-in imports as-is") {
    // A projected store is dimensionally self-consistent (the reference
    // rewrites every vector file to k=500, src/db.rs:301-367), so only
    // the eigen.bin probe can catch it (existence = projected flag,
    // src/db.rs:233-237).
    val dir = Files.createTempDirectory("graft-victor-proj").toString
    VictorBin.export(Seq(
      (uuid(21), Seq(0.3f, 0.7f), "pca-space", Seq("de")))
      .toDF("id", "vector", "content", "tags"), dir)
    Files.write(java.nio.file.Paths.get(dir, "eigen.bin"), Array[Byte](1, 2, 3))
    assert(VictorBin.isProjected(dir))
    val e = intercept[IllegalArgumentException] { VictorBin.importStore(spark, dir) }
    assert(e.getMessage.contains("PCA-projected"))
    assert(e.getMessage.contains("eigen.bin"))
    // importVictor would ADOPT the basis — a garbage eigen.bin must
    // fail the parse loudly, never import silently
    val store = new graft.operators.VectorStore(
      spark, Files.createTempDirectory("graft-victor-proj-store").toString)
    intercept[Exception] { store.importVictor(dir) }
    assert(!store.isProjected)
    // explicit opt-in still imports the coordinates as-is
    assert(VictorBin.importStore(spark, dir, acceptProjected = true).count() == 1)
  }

  test("eigen.bin byte layout: golden bytes, round trip, corruption cases") {
    import graft.operators.Pca
    // golden: hand-built bincode-1 bytes for d=3, k=2 (column-major
    // data + trailing dims + means), NOT via our writer
    val d = 3; val k = 2
    val basis = Array(Array(1.0, 4.0), Array(2.0, 5.0), Array(3.0, 6.0))
    val means = Array(0.5, -1.0, 2.0)
    val bb = java.nio.ByteBuffer.allocate(8 + 6 * 4 + 8 * 3 + 3 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(6L) // Vec<f32> len = d*k
    Seq(1f, 2f, 3f, 4f, 5f, 6f).foreach(bb.putFloat) // column-major
    bb.putLong(3L).putLong(2L) // nrows, ncols (VecStorage field order)
    bb.putLong(3L) // means len
    Seq(0.5f, -1f, 2f).foreach(bb.putFloat)
    val dir = Files.createTempDirectory("graft-eigen-golden").toString
    Files.write(java.nio.file.Paths.get(dir, "eigen.bin"), bb.array())
    val m = VictorBin.readProjection(dir)
    assert(m.d == d && m.k == k)
    assert(m.basis.map(_.toSeq).toSeq == basis.map(_.toSeq).toSeq)
    assert(m.means.toSeq == means.toSeq)
    // round trip through our writer
    val dir2 = Files.createTempDirectory("graft-eigen-rt").toString
    VictorBin.writeProjection(dir2, Pca.Model(basis, means))
    val m2 = VictorBin.readProjection(dir2)
    assert(m2.basis.map(_.toSeq).toSeq == m.basis.map(_.toSeq).toSeq)
    assert(m2.means.toSeq == m.means.toSeq)
    // corruption: data length != nrows*ncols
    val badDir = Files.createTempDirectory("graft-eigen-bad").toString
    val bad = java.nio.ByteBuffer.allocate(8 + 4 + 8 * 3 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.putLong(1L); bad.putFloat(1f)
    bad.putLong(3L).putLong(2L); bad.putLong(1L); bad.putFloat(0f)
    Files.write(java.nio.file.Paths.get(badDir, "eigen.bin"), bad.array())
    val e1 = intercept[IllegalArgumentException] { VictorBin.readProjection(badDir) }
    assert(e1.getMessage.contains("corrupt eigen.bin"))
    // corruption: square basis is not a projection
    val sqDir = Files.createTempDirectory("graft-eigen-sq").toString
    intercept[IllegalArgumentException] {
      VictorBin.writeProjection(sqDir, Pca.Model(Array(Array(1.0), Array(2.0)).map(_.padTo(2, 0.0)), Array(0.0, 0.0)))
    }
    // corruption: trailing bytes
    val trDir = Files.createTempDirectory("graft-eigen-tr").toString
    VictorBin.writeProjection(trDir, Pca.Model(basis, means))
    val pth = java.nio.file.Paths.get(trDir, "eigen.bin")
    Files.write(pth, Files.readAllBytes(pth) ++ Array[Byte](0))
    val e2 = intercept[IllegalArgumentException] { VictorBin.readProjection(trDir) }
    assert(e2.getMessage.contains("trailing"))
  }

  test("projected victor store migrates WITH its semantics: basis adopted, raw queries projected") {
    import graft.operators.Pca
    // A raw 3-dim corpus, projected to k=2 exactly like the reference:
    // center with column means, multiply by the basis (src/db.rs:456-469)
    val basis = Array(Array(0.8, -0.6), Array(0.6, 0.8), Array(0.0, 0.0))
    val means = Array(1.0, 2.0, 3.0)
    val model = Pca.Model(basis, means)
    val raw = Seq(
      (uuid(31), Seq(2f, 2f, 3f), "east", Seq("t")),
      (uuid(32), Seq(1f, 3f, 3f), "north", Seq("t")),
      (uuid(33), Seq(0f, 1f, 3f), "southwest", Seq("t")))
    val dir = Files.createTempDirectory("graft-victor-proj-mig").toString
    VictorBin.export(raw.map { case (id, v, c, t) =>
      (id, Pca.projectOne(model, v).toSeq, c, t)
    }.toDF("id", "vector", "content", "tags"), dir)
    VictorBin.writeProjection(dir, model)
    val store = new graft.operators.VectorStore(
      spark, Files.createTempDirectory("graft-victor-proj-mig-store").toString)
    store.importVictor(dir)
    assert(store.isProjected) // the migrated store kept projected mode
    // raw-space query served correctly: searchAuto projects it through
    // the adopted basis; nearest to (2,2,3) in projected space is itself
    val hit = store.searchAuto(Seq(2f, 2f, 3f), k = 1).head()
    assert(hit.getAs[String]("content") == "east")
    // raw-space insert is projected at write time through the SAME basis
    store.insert(Seq((uuid(34), Seq(0.5f, 1f, 3f), "close-to-sw", Seq("t")))
      .toDF("id", "vector", "content", "tags"))
    val hit2 = store.searchAuto(Seq(0f, 1f, 3f), k = 2)
      .select("content").collect().map(_.getString(0)).toSet
    assert(hit2 == Set("southwest", "close-to-sw"))
    // a second projected import into the now-projected store refuses
    val e = intercept[IllegalArgumentException] { store.importVictor(dir) }
    assert(e.getMessage.contains("already projected"))
    store.clear()
  }

  test("bidirectional migration: a PROJECTED graft store exports with eigen.bin and re-imports intact") {
    // build a projected graft store the honest way: raw inserts, then
    // projectAll fits + adopts a basis
    val store = new graft.operators.VectorStore(
      spark, Files.createTempDirectory("graft-ev-src").toString)
    val raw = Seq(
      (uuid(51), Seq(10f, 0f, 0f), "xward", Seq("t")),
      (uuid(52), Seq(0f, 10f, 0f), "yward", Seq("t")),
      (uuid(53), Seq(0f, 0f, 10f), "zward", Seq("t")),
      (uuid(54), Seq(9f, 1f, 0f), "near-x", Seq("t")),
      (uuid(55), Seq(1f, 9f, 1f), "near-y", Seq("t")))
    store.insert(raw.toDF("id", "vector", "content", "tags"))
    store.projectAll(k = 2)
    assert(store.isProjected)
    val dir = Files.createTempDirectory("graft-ev-out").toString
    store.exportVictor(dir)
    // the export IS a projected victor store: eigen.bin present
    assert(VictorBin.isProjected(dir))
    val m = VictorBin.readProjection(dir)
    val m0 = store.loadModel()
    assert(m.d == m0.d && m.k == m0.k)
    for (i <- 0 until m.d) {
      assert(math.abs(m.means(i) - m0.means(i)) < 1e-5, s"mean $i")
      for (j <- 0 until m.k)
        assert(math.abs(m.basis(i)(j) - m0.basis(i)(j)) < 1e-5, s"basis $i,$j")
    }
    // re-import into a fresh store: projected mode + behavior survive
    // the round trip (vectors pass the 8-bit packed codec, so compare
    // BEHAVIOR — raw-space queries serve the same nearest content)
    val back = new graft.operators.VectorStore(
      spark, Files.createTempDirectory("graft-ev-back").toString)
    back.importVictor(dir)
    assert(back.isProjected)
    // a stored vector queries back to itself exactly...
    val self = store.searchAuto(Seq(10f, 0f, 0f), k = 1).head().getAs[String]("content")
    assert(self == "xward")
    // ...and for arbitrary raw queries the ROUND-TRIPPED store serves
    // the same answer the direct store does (nearest-in-projected-space
    // is the semantic; the two stores must agree on it)
    for (q <- Seq(Seq(10f, 0f, 0f), Seq(0f, 9f, 0f), Seq(0f, 1f, 10f),
        Seq(5f, 5f, 0f))) {
      val a = store.searchAuto(q, k = 1).head().getAs[String]("content")
      val b = back.searchAuto(q, k = 1).head().getAs[String]("content")
      assert(a == b, s"query $q: direct=$a roundtrip=$b")
    }
    store.clear(force = true); back.clear(force = true)
  }

  test("projected import refuses a non-empty target and a k-mismatched source") {
    import graft.operators.Pca
    val basis = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.0, 0.0))
    val means = Array(0.0, 0.0, 0.0)
    // non-empty target
    val dir = Files.createTempDirectory("graft-victor-proj-ne").toString
    VictorBin.export(Seq((uuid(41), Seq(1f, 0f), "p", Seq("t")))
      .toDF("id", "vector", "content", "tags"), dir)
    VictorBin.writeProjection(dir, Pca.Model(basis, means))
    val store = new graft.operators.VectorStore(
      spark, Files.createTempDirectory("graft-victor-proj-ne-store").toString)
    store.insert(Seq((uuid(42), Seq(1f, 2f, 3f), "existing", Seq("t")))
      .toDF("id", "vector", "content", "tags"))
    val e = intercept[IllegalArgumentException] { store.importVictor(dir) }
    assert(e.getMessage.contains("EMPTY target store"))
    store.clear(force = true)
    // k mismatch: eigen says k=2, vectors are 3-dim
    val dir2 = Files.createTempDirectory("graft-victor-proj-km").toString
    VictorBin.export(Seq((uuid(43), Seq(1f, 0f, 0f), "p", Seq("t")))
      .toDF("id", "vector", "content", "tags"), dir2)
    VictorBin.writeProjection(dir2, Pca.Model(basis, means))
    val store2 = new graft.operators.VectorStore(
      spark, Files.createTempDirectory("graft-victor-proj-km-store").toString)
    val e2 = intercept[IllegalArgumentException] { store2.importVictor(dir2) }
    assert(e2.getMessage.contains("corrupt source store"))
  }

  test("corrupt inputs fail loudly: bad record size, truncated file, bad uuid length") {
    val bad1 = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad1.putInt(10).putInt(0) // record size 10 <= 40
    intercept[IllegalArgumentException] { VictorBin.parseDbFile(bad1.array()).toList }
    val bad2 = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad2.putInt(41) // claims 41-byte records, 6 bytes follow
    intercept[IllegalArgumentException] { VictorBin.parseDbFile(bad2.array()).toList }
  }
}
