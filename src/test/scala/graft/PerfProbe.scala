package graft

object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup")(docs)
    time("signatures")(graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text"))
    time("signatures2")(graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text"))
    time("pairs")(graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", jaccardThreshold = 0.5))
    time("pairs_repart")(graft.operators.Dedup.minhashLshPairs(docs.repartition(32), "doc_id", "text", jaccardThreshold = 0.5))
    time("shingles")(docs.select(graft.operators.Dedup.shingles(
      org.apache.spark.sql.functions.col("text"), 3)))
    time("pipeline_1part")(graft.operators.QualityFilter.run(graft.sources.Pages.load(spark, dir)))
    time("pipeline_32part")(graft.operators.QualityFilter.run(graft.sources.Pages.load(spark, dir).repartition(32)))
    spark.stop()
  }
}
