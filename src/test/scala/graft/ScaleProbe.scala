package graft

object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val corpus = "/tmp/graft_bench_corpus_r600"
    def run(cpus: Int, splitMb: Int): Double = {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", (splitMb * 1024 * 1024).toString)
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      def job = graft.operators.QualityFilter.run(s.read.parquet(corpus))
        .select("url", "keep", "fail_reasons", "scrubbed_text", "lang_pred", "ppl")
      job.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      job.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      s.stop()
      sec
    }
    for (split <- Seq(2, 8)) {
      val t32 = scala.collection.mutable.ArrayBuffer[Double]()
      val t8 = scala.collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to 3) { t32 += run(32, split); t8 += run(8, split) }
      val (b32, b8) = (t32.min, t8.min)
      println(f"split=${split}MB local32=${b32}%.2f local8=${b8}%.2f eff=${b8 / b32 / 4}%.3f  (32:${t32.map(x => f"$x%.1f").mkString(",")} 8:${t8.map(x => f"$x%.1f").mkString(",")})")
    }
  }
}
