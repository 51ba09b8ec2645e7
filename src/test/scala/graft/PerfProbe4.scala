package graft
object PerfProbe4 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    def run(cpus: Int): Unit = {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val pages = graft.sources.Pages.loadReplicated(spark, "/root/testdata/sf0.1", 150)
        .drop("html")
      def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[$cpus] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("base")(pages)
      time("stats_udf")(pages.select(graft.functions.TextStats.statsCol(col("text"))))
      time("scrub_udf")(pages.select(graft.functions.Scrub.scrubFast(col("text"))))
      time("scores")(graft.functions.ModelScores.withScores(pages))
      spark.stop()
    }
    run(8); run(32)
  }
}
