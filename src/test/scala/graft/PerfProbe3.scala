package graft
object PerfProbe3 {
  def main(args: Array[String]): Unit = {
    def run(cpus: Int): Double = {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val pages = graft.sources.Pages.loadReplicated(spark, "/root/testdata/sf0.1", 150)
      def job = graft.operators.QualityFilter.run(pages)
        .select("url", "keep", "fail_reasons", "scrubbed_text", "lang_pred", "ppl")
      job.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      job.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      sec
    }
    println(f"local32: ${run(32)}%.2f s")
    println(f"local8: ${run(8)}%.2f s")
    println(f"local32b: ${run(32)}%.2f s")
  }
}
