package graft
object PerfProbe2 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = graft.sources.Pages.loadReplicated(spark, "/root/testdata/sf0.1", 150)
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val noHtml = pages.drop("html")
    time("synthesis_only")(noHtml)
    time("synthesis_only2")(noHtml)
    time("scores_only")(graft.functions.ModelScores.withScores(noHtml))
    time("scrub_only")(noHtml.select(graft.functions.Scrub.scrub(col("text"))))
    val verdicts = graft.operators.QualityFilter.ruleVerdicts(graft.operators.QualityFilter.heuristicRules)
    time("heuristics_only")(noHtml.select(verdicts.map{case (n,c)=>c.as(n)}:_*))
    time("stopword_only")(noHtml.select(graft.functions.Heuristics.stopwordFraction(col("text"))))
    time("symbol_only")(noHtml.select(graft.functions.Heuristics.symbolWordRatio(col("text"))))
    time("dup2gram_only")(noHtml.select(graft.functions.Heuristics.dup2gramFraction(col("text"))))
    time("quality_score")(noHtml.select(graft.functions.Heuristics.qualityScore(col("text"))))
    time("full")(graft.operators.QualityFilter.run(pages))
    spark.stop()
  }
}
