package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Multimodal binary-column pipeline: REAL image decode via the JDK's
  * ImageIO for formats it ships readers for, deterministic stub fallback
  * for everything else (the seam an audio/video decoder would fill).
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("decode: real dimensions for PNG/JPEG, stub fallback otherwise") {
    assert(Multimodal.decode(png(123, 45)) == ((123, 45, true)))
    assert(Multimodal.decode(jpeg(64, 32)) == ((64, 32, true)))
    val garbage = "definitely not an image".getBytes("UTF-8")
    val (w, h, real) = Multimodal.decode(garbage)
    assert(!real && (w, h) == Multimodal.decodeStub(garbage))
  }

  test("distributed extractFeatures: mixed real images + opaque payloads") {
    import spark.implicits._
    val rows = Seq(
      (1L, png(320, 200)),
      (2L, jpeg(17, 9)),
      (3L, Array.fill[Byte](1000)(42)),
      (4L, Array.emptyByteArray))
    val feats = Multimodal.extractFeatures(spark.createDataset(rows), "image")
      .collect().sortBy(_.id)
    assert(feats.map(f => (f.id, f.width, f.height, f.decoded)).toSeq == Seq(
      (1L, 320, 200, true),
      (2L, 17, 9, true),
      (3L, Multimodal.decodeStub(rows(2)._2)._1, Multimodal.decodeStub(rows(2)._2)._2, false),
      (4L, 16, 16, false)))
    assert(feats.forall(f => f.sha.length == 64))
    assert(feats(0).n_bytes == rows.head._2.length)
  }
}
