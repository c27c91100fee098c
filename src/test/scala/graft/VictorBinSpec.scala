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

  test("projected victor store (eigen.bin present) is refused loudly, accepted only explicitly") {
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
    // importVictor (the one-call migration) refuses through the same probe
    val store = new graft.operators.VectorStore(
      spark, Files.createTempDirectory("graft-victor-proj-store").toString)
    val e2 = intercept[IllegalArgumentException] { store.importVictor(dir) }
    assert(e2.getMessage.contains("PCA-projected"))
    // explicit opt-in still imports the coordinates as-is
    assert(VictorBin.importStore(spark, dir, acceptProjected = true).count() == 1)
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
