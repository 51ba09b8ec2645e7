package graft

import org.apache.spark.sql.functions._

/** Regenerates the committed golden labels for the fixture corpus.
  * Run: sbt "Test/runMain graft.GoldenWriter"
  * Output: src/test/resources/golden_verdicts.csv — review the diff before
  * committing; these ARE the reference labels the F1 gate compares against.
  */
object GoldenWriter {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val v = graft.operators.QualityFilter.run(
      graft.sources.GoldenCorpus.generate(spark))
      .select(col("url"), col("keep"),
        concat_ws("|", col("fail_reasons")).as("fail_reasons"),
        md5(col("scrubbed_text")).as("scrubbed_md5"),
        col("lang_pred"), round(col("ppl"), 4).as("ppl"),
        col("lang"))
      .orderBy(col("url"))
    val rows = v.collect().map { r =>
      Seq(r.getString(0), r.getBoolean(1), r.getString(2), r.getString(3),
        r.getString(4), r.getDouble(5), r.getString(6)).mkString(",")
    }
    val out = "url,keep,fail_reasons,scrubbed_md5,lang_pred,ppl,lang" +:
      rows.toSeq
    val p = java.nio.file.Paths.get("src/test/resources/golden_verdicts.csv")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, out.mkString("\n") + "\n")
    println(s"wrote ${rows.length} golden rows to $p")
    val keepRate = v.filter(col("keep")).count().toDouble / rows.length
    val langAcc = v.filter(col("lang_pred") === col("lang")).count().toDouble / rows.length
    println(f"keep rate: $keepRate%.3f, langid accuracy vs label: $langAcc%.3f")
    spark.stop()
  }
}
