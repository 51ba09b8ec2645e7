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
  val ivfPath = "src/test/resources/golden_ivf_trained_sf0001.csv"
  val qualityPath = "src/test/resources/golden_quality_sf0001.csv"

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

  /** (vec_id, cell) assignments of the k-means-refined IVF index over the
    * sf0.001 embeddings (k=8, 2 Lloyd rounds). The driver gate oracles
    * only the untrained index (`ann_ivf`); this pin makes a regression in
    * the Lloyd refinement itself fail `sbt test`. Float-sum determinism:
    * stable under the fixed TestSpark session/partitioning; regenerate
    * deliberately if the test harness parallelism changes.
    */
  def ivfRows(spark: org.apache.spark.sql.SparkSession): Seq[String] = {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    graft.operators.Similarity
      .ivfIndexTrained(e, "vec_id", "embedding", k = 8, iters = 2)._1
      .select("vec_id", "__cell")
      .collect()
      .map(r => s"${r.getLong(0)},${r.getLong(1)}")
      .sorted.toSeq
  }

  /** Trained quality-classifier probabilities over scrubbed text. */
  def qualityRows(spark: org.apache.spark.sql.SparkSession): Seq[String] =
    SparkEntry.queries("text_quality_model")(spark, sfDir)
      .collect()
      .map(r => s"${r.getLong(0)},${r.getDouble(1)}")
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

  test("text_quality_model output matches the committed sf0.001 golden exactly") {
    val computed = SfGolden.qualityRows(spark)
    val expected = SfGolden.readCommitted(SfGolden.qualityPath)
    assert(computed.size == expected.size)
    val bad = computed.zip(expected).filter { case (c, e) => c != e }
    assert(bad.isEmpty, s"quality-model drift: ${bad.take(3)}")
  }

  test("trained IVF (vec_id, cell) assignment matches the committed " +
    "sf0.001 golden, and recall at fixed probes holds") {
    val computed = SfGolden.ivfRows(spark)
    val expected = SfGolden.readCommitted(SfGolden.ivfPath)
    assert(computed.size == expected.size)
    val bad = computed.zip(expected).filter { case (c, e) => c != e }
    assert(bad.isEmpty, s"trained-IVF assignment drift: ${bad.take(5)}")
    // recall floor at the gate's shape (top-10, k=8, probes=3): the
    // trained index must keep finding the true neighbors, not just any
    // stable partition of the space
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"${SfGolden.sfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val brute = graft.operators.Similarity
      .bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val trained = graft.operators.Similarity
      .ivfTopK(e, "vec_id", "embedding", q, 10, k = 8, probes = 3,
        trainIters = 2)
      .collect().map(_.getLong(0)).toSet
    // measured 6/10 at this shape (scan fraction 3/8 of 2000 vectors);
    // the floor pins that the refinement never degrades below it
    assert(brute.intersect(trained).size >= 6,
      s"trained-IVF recall ${brute.intersect(trained).size}/10 below floor")
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
    write(SfGolden.ivfPath, SfGolden.ivfRows(spark))
    write(SfGolden.qualityPath, SfGolden.qualityRows(spark))
    spark.stop()
  }
}
