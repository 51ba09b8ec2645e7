package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden pins for the two driver queries that have no SQL oracle
  * (CORRECTNESS gate records them rows-only): `text_langid` (model
  * scores) and `multimodal_features` (binary image decode). The expected
  * outputs for the sf0.001 corpus are COMMITTED as CSV — a regression in
  * the langid/perplexity scorers or the decode path fails `sbt test`
  * rather than slipping through a rows>0 check.
  *
  * Regenerate deliberately via `sbt "Test/runMain graft.SfGoldenWriter"`
  * and review the diff (the files ARE the contract).
  */
object SfGolden {
  val sfDir = "/root/testdata/sf0.001"
  val langidPath = "src/test/resources/golden_langid_sf0001.csv"
  val mediaPath = "src/test/resources/golden_media_sf0001.csv"

  /** Canonical row strings for the exact driver query output. */
  def langidRows(spark: org.apache.spark.sql.SparkSession): Seq[String] =
    SparkEntry.queries("text_langid")(spark, sfDir)
      .collect()
      .map(r => Seq(r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3)).mkString(","))
      .sorted.toSeq

  def mediaRows(spark: org.apache.spark.sql.SparkSession): Seq[String] =
    SparkEntry.queries("multimodal_features")(spark, sfDir)
      .collect()
      .map(r => Seq(r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3)).mkString(","))
      .sorted.toSeq

  def readCommitted(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().toList finally src.close()
  }
}

class SfGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("text_langid output matches the committed sf0.001 golden exactly") {
    val computed = SfGolden.langidRows(spark)
    val expected = SfGolden.readCommitted(SfGolden.langidPath)
    assert(computed.size == expected.size)
    val bad = computed.zip(expected).filter { case (c, e) => c != e }
    assert(bad.isEmpty, s"langid drift: ${bad.take(3)}")
  }

  test("multimodal_features output matches the committed sf0.001 golden exactly") {
    val computed = SfGolden.mediaRows(spark)
    val expected = SfGolden.readCommitted(SfGolden.mediaPath)
    assert(computed.size == expected.size)
    val bad = computed.zip(expected).filter { case (c, e) => c != e }
    assert(bad.isEmpty, s"media drift: ${bad.take(3)}")
  }
}

/** Regenerates the committed sf0.001 golden outputs — review the diff. */
object SfGoldenWriter {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    def write(path: String, rows: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(path)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, rows.mkString("\n") + "\n")
      println(s"wrote ${rows.size} rows to $p")
    }
    write(SfGolden.langidPath, SfGolden.langidRows(spark))
    write(SfGolden.mediaPath, SfGolden.mediaRows(spark))
    spark.stop()
  }
}
