package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Does scan-only 8->32 scaling improve when the stage is long enough to
  * amortize per-task fixed costs? Round-5 claim check: the bench corpus's
  * scan stage is sub-second (~5% of job) and its poor ratio (~0.40) is
  * per-task overhead at 0.5 s stage times, NOT a 100 TB behavior. If
  * that's true, the same scan over the 4x corpus (amortizing fixed costs
  * 4x) must read materially higher.
  */
object ScanScaleProbe4 {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"scanprobe4-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (1 << 21).toString)
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "4g")
      .config("spark.sql.columnVector.offheap.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def main(args: Array[String]): Unit = {
    val corpora = Seq(
      "1x" -> "/tmp/graft_bench_corpus_r1200",
      "4x" -> "/tmp/graft_bench_corpus_r4800")
    def run(cpus: Int, path: String): Double = {
      val s = session(cpus)
      force(s.read.parquet(path))
      val t0 = System.nanoTime(); force(s.read.parquet(path))
      val t = (System.nanoTime() - t0) / 1e9
      s.stop(); t
    }
    (1 to 3).foreach { round =>
      corpora.foreach { case (name, path) =>
        if (new java.io.File(s"$path/_SUCCESS").exists()) {
          val t32 = run(32, path); val t8 = run(8, path)
          println(f"round$round scan_only $name t8=$t8%6.2f t32=$t32%6.2f " +
            f"eff=${t8 / t32 / 4}%.3f")
        } else println(s"round$round scan_only $name SKIP (no corpus)")
      }
    }
  }
}
