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
      "media_bytes", "media_features", "media_resized", "media_frames"))
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
