package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
/** Isolates which stage of the bench scaling job stops scaling 8->32:
  * scan-only, scan+scorer, full job with/without scrubbed output. */
object ScanScaleProbe {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (1 << 21).toString)
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def main(args: Array[String]): Unit = {
    val corpus = "/tmp/graft_bench_corpus_r1200"
    val variants: Seq[(String, SparkSession => DataFrame)] = Seq(
      "scan_only" -> (s => s.read.parquet(corpus)),
      "scan_text" -> (s => s.read.parquet(corpus).select("text")),
      "full_job" -> (s => graft.operators.QualityFilter.run(s.read.parquet(corpus))
        .select("url", "keep", "fail_reasons", "scrubbed_text", "lang_pred", "ppl")),
      "job_no_scrub_out" -> (s => graft.operators.QualityFilter.run(s.read.parquet(corpus))
        .select("url", "keep", "lang_pred", "ppl"))
    )
    def run(cpus: Int, f: SparkSession => DataFrame): Double = {
      val s = session(cpus)
      force(f(s)) // warm
      val t0 = System.nanoTime(); force(f(s)); val t = (System.nanoTime()-t0)/1e9
      s.stop(); t
    }
    variants.foreach { case (n, f) =>
      val t32a = run(32, f); val t8 = run(8, f); val t32b = run(32, f)
      val t32 = math.min(t32a, t32b)
      println(f"$n%-17s t8=$t8%7.2fs t32=$t32%7.2fs eff=${t8/t32/4}%.3f")
    }
  }
}
