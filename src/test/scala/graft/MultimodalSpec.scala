package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The REAL javax.imageio lane (VERDICT r13 next #5): PNG encode ->
  * decode round-trips the synthetic raster exactly, and the
  * distributed feature extraction matches the closed-form values the
  * DuckDB oracle states. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("synthPng round-trips exact pixel values through a real PNG codec") {
    for (docId <- Seq(0L, 7L, 300L)) {
      val bytes = Multimodal.synthPng(docId)
      // real PNG magic, not a stub rendering
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = Multimodal.imageDims(docId)
      assert(img.getWidth == w && img.getHeight == h)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) == ((docId + x + y) % 256L).toInt,
          s"doc $docId pixel ($x,$y)")
    }
  }

  test("decodeImageFeatures matches hand-computed closed-form values") {
    val docs = Seq(0L, 1L, 4L).toDF("doc_id")
    val media = Multimodal.attachImagePayload(spark, docs)
    val got = Multimodal.decodeImageFeatures(spark, media)
      .collect().map(f => f.doc_id -> f).toMap
    def expected(d: Long) = {
      val (w, h) = Multimodal.imageDims(d)
      val sum = (for (y <- 0 until h; x <- 0 until w) yield (d + x + y) % 256L).sum
      val (rw, rh) = ((w + 3) / 4, (h + 3) / 4)
      val rsum = (for (y <- 0 until rh; x <- 0 until rw) yield (d + 4 * x + 4 * y) % 256L).sum
      (w.toLong, h.toLong, sum, sum * 100L / (w * h), rw.toLong, rh.toLong, rsum)
    }
    for (d <- Seq(0L, 1L, 4L)) {
      val f = got(d)
      assert((f.img_w, f.img_h, f.px_sum, f.px_mean_x100, f.rs_w, f.rs_h, f.rs_sum)
        == expected(d), s"doc $d")
    }
  }

  test("undecodable payload fails loudly with the doc id") {
    val junk = Seq((9L, "application/octet-stream",
      Array[Byte](1, 2, 3, 4))).toDF("doc_id", "media_type", "payload")
    val e = intercept[Exception] {
      Multimodal.decodeImageFeatures(spark, junk).collect()
    }
    def chain(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(m => m.contains("undecodable") && m.contains("9"))))
  }
}
