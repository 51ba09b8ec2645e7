package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Focused follow-up to ScanScaleProbe2: the two levers that moved the
  * full-job 8->32 ratio (columnarReaderBatchSize=512, off-heap column
  * vectors) re-measured alone and combined, THREE interleaved rounds per
  * variant so a single contended window can't pick the winner.
  */
object ScanScaleProbe3 {
  final case class Variant(name: String, conf: Map[String, String])
  private def session(cpus: Int, v: Variant): SparkSession = {
    val b = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"scanprobe3-$cpus-${v.name}")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (1 << 21).toString)
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false")
    v.conf.foreach { case (k, x) => b.config(k, x) }
    val s = b.getOrCreate(); s.sparkContext.setLogLevel("ERROR"); s
  }
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def main(args: Array[String]): Unit = {
    val corpus = "/tmp/graft_bench_corpus_r1200"
    val offheap = Map("spark.memory.offHeap.enabled" -> "true",
      "spark.memory.offHeap.size" -> "4g",
      "spark.sql.columnVector.offheap.enabled" -> "true")
    val batch512 = Map("spark.sql.parquet.columnarReaderBatchSize" -> "512")
    val variants = Seq(
      Variant("baseline", Map.empty),
      Variant("batch512", batch512),
      Variant("offheapVec", offheap),
      Variant("both", batch512 ++ offheap))
    def job(s: SparkSession): DataFrame =
      graft.operators.QualityFilter.run(s.read.parquet(corpus))
        .select("url", "keep", "fail_reasons", "scrubbed_text",
          "lang_pred", "ppl")
    def run(cpus: Int, v: Variant): Double = {
      val s = session(cpus, v)
      force(job(s))
      val t0 = System.nanoTime(); force(job(s))
      val t = (System.nanoTime() - t0) / 1e9
      s.stop(); t
    }
    val best8 = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    val best32 = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    (1 to 3).foreach { round =>
      variants.foreach { v =>
        val t32 = run(32, v); val t8 = run(8, v)
        best32(v.name) = math.min(best32(v.name), t32)
        best8(v.name) = math.min(best8(v.name), t8)
        println(f"round$round ${v.name}%-12s t8=$t8%6.2f t32=$t32%6.2f " +
          f"eff=${t8 / t32 / 4}%.3f")
      }
    }
    variants.foreach { v =>
      println(f"BEST ${v.name}%-12s t8=${best8(v.name)}%6.2f " +
        f"t32=${best32(v.name)}%6.2f " +
        f"eff=${best8(v.name) / best32(v.name) / 4}%.3f")
    }
  }
}
