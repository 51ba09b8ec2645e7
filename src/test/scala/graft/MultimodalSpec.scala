package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("magic-byte sniffing (real logic, no stub)") {
    assert(Multimodal.sniffFormat(Array[Byte](0x89.toByte, 'P', 'N', 'G')) == "png")
    assert(Multimodal.sniffFormat(Array[Byte](0xff.toByte, 0xd8.toByte, 0, 0)) == "jpeg")
    assert(Multimodal.sniffFormat("RIFFxxxx".getBytes) == "riff")
    assert(Multimodal.sniffFormat("<html>".getBytes) == "html")
    assert(Multimodal.sniffFormat(null) == "unknown")
  }

  test("decode/resize/frame-sample plumbing: schema, determinism, batch shape") {
    val rows = Seq(
      ("a", "<html>hello world</html>".getBytes("UTF-8")),
      ("b", Array.tabulate(4096)(i => (i % 251).toByte)),
      ("c", null.asInstanceOf[Array[Byte]])
    ).toDF("key", "blob")
    val out = Multimodal.withMediaFeatures(rows, "blob")
    assert(out.columns.toSeq == Seq("key", "blob", "media_format",
      "media_bytes", "media_width", "media_height", "media_features",
      "media_resized", "media_frames"))
    val r = out.collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Long]("media_bytes") == 24)
    assert(r("a").getAs[String]("media_format") == "html")
    assert(r("b").getAs[scala.collection.Seq[Float]]("media_features").length == 16)
    assert(r("b").getAs[scala.collection.Seq[Float]]("media_resized").length == 4)
    assert(r("b").getAs[scala.collection.Seq[Int]]("media_frames").nonEmpty)
    assert(r("c").getAs[Long]("media_bytes") == 0)
    // deterministic across evaluations (blob column dropped: Array[Byte]
    // toString is identity-based)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.drop("blob").collect().map(_.toString).sorted.toSeq
    assert(canon(Multimodal.withMediaFeatures(rows, "blob")) == canon(out))
  }

  test("real PNG decode via JDK ImageIO: dimensions, histogram, resize") {
    // 8x4 PNG: left half black, right half white — rendered in-test
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    assert(Multimodal.sniffFormat(png) == "png")

    val d = Multimodal.decodeImage(png).get
    assert(d.width == 8 && d.height == 4)
    // half the pixels in the darkest bin, half in the brightest
    assert(d.histogram(0) == 0.5f && d.histogram(15) == 0.5f)

    // pixel-space resize: 2x2 grid = (dark, bright, dark, bright)
    val rz = Multimodal.resizeImage(png, grid = 2).get
    assert(rz(0) == 0f && rz(2) == 0f)
    assert(rz(1) > 0.99f && rz(3) > 0.99f)

    // end-to-end through the Spark operator
    val rows = Seq(("p", png)).toDF("key", "blob")
    val r = Multimodal.withMediaFeatures(rows, "blob").head()
    assert(r.getAs[String]("media_format") == "png")
    assert(r.getAs[Int]("media_width") == 8)
    assert(r.getAs[Int]("media_height") == 4)
    assert(r.getAs[scala.collection.Seq[Float]]("media_features")(0) == 0.5f)
  }

  test("undecodable image bytes fall back to the stub path, no crash") {
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4)
    val rows = Seq(("x", fakePng)).toDF("key", "blob")
    val r = Multimodal.withMediaFeatures(rows, "blob").head()
    assert(r.getAs[String]("media_format") == "png")
    assert(r.getAs[Int]("media_width") == -1)
    assert(r.getAs[scala.collection.Seq[Float]]("media_features").length == 16)
  }

  test("resize kernel: mean pooling over equal spans") {
    val f = Array(1f, 1f, 3f, 3f, 5f, 5f, 7f, 7f)
    assert(Multimodal.resizeStub(f, 4).toSeq == Seq(1f, 3f, 5f, 7f))
    assert(Multimodal.resizeStub(null, 4).toSeq == Seq(0f, 0f, 0f, 0f))
  }

  test("metadata-only projection does not carry the payload") {
    val rows = Seq(("a", "<html>x</html>".getBytes("UTF-8"))).toDF("key", "blob")
    val meta = Multimodal.mediaMeta(rows, "key", "blob")
    assert(meta.columns.toSeq == Seq("key", "media_bytes", "media_format"))
    val r = meta.head()
    assert(r.getLong(1) == 14 && r.getString(2) == "html")
  }
}
