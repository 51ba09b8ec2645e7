package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-5 scan-path scaling experiment: the round-4 isolation located the
  * residual saturated 8->32 gap in the Spark scan/row-materialization
  * stage (scan-only eff 0.40, ~8% of wall). This probe sweeps the
  * candidate levers — columnar batch size, split size, off-heap column
  * vectors — on the scan-only stage and the full job, bracketing every
  * measurement with a memory-bandwidth reading so contended windows are
  * visible (the scan stage is bandwidth-bound; an ALU probe can't see its
  * noise mode).
  *
  * Usage: Test/runMain graft.ScanScaleProbe2 [variantFilter]
  */
object ScanScaleProbe2 {

  private lazy val bwArr: Array[Long] = Array.tabulate(1 << 24)(_.toLong)
  @volatile private var sink = 0L
  private def membwGbps(threads: Int, passes: Int = 3): Double = {
    val arr = bwArr; val n = arr.length
    val t0 = System.nanoTime()
    val ts = (0 until threads).map(t => new Thread(() => {
      val start = (n.toLong * t / threads).toInt
      var s = 0L; var p = 0
      while (p < passes) {
        var i = start
        while (i < n) { s += arr(i); i += 1 }
        i = 0
        while (i < start) { s += arr(i); i += 1 }
        p += 1
      }
      sink += s
    }))
    ts.foreach(_.start()); ts.foreach(_.join())
    threads.toLong * passes * n * 8L / ((System.nanoTime() - t0) / 1e9) / 1e9
  }

  final case class Variant(name: String,
                           conf: Map[String, String] = Map.empty)

  private def session(cpus: Int, v: Variant): SparkSession = {
    val b = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"scanprobe-$cpus-${v.name}")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (1 << 21).toString)
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false")
    v.conf.foreach { case (k, x) => b.config(k, x) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val corpus = "/tmp/graft_bench_corpus_r1200"
    val filter = args.headOption.getOrElse("")
    val variants = Seq(
      Variant("baseline"),
      Variant("batch512",
        Map("spark.sql.parquet.columnarReaderBatchSize" -> "512")),
      Variant("batch16k",
        Map("spark.sql.parquet.columnarReaderBatchSize" -> "16384")),
      Variant("split8m",
        Map("spark.sql.files.maxPartitionBytes" -> (1 << 23).toString)),
      Variant("split512k",
        Map("spark.sql.files.maxPartitionBytes" -> (1 << 19).toString)),
      Variant("offheapVec",
        Map("spark.memory.offHeap.enabled" -> "true",
          "spark.memory.offHeap.size" -> "4g",
          "spark.sql.columnVector.offheap.enabled" -> "true")),
      Variant("batch16k_split8m",
        Map("spark.sql.parquet.columnarReaderBatchSize" -> "16384",
          "spark.sql.files.maxPartitionBytes" -> (1 << 23).toString))
    ).filter(_.name.contains(filter))

    val stages: Seq[(String, SparkSession => DataFrame)] = Seq(
      "scan_only" -> (s => s.read.parquet(corpus)),
      "full_job" -> (s => graft.operators.QualityFilter
        .run(s.read.parquet(corpus))
        .select("url", "keep", "fail_reasons", "scrubbed_text",
          "lang_pred", "ppl")))

    membwGbps(32, 1) // JIT + page-touch, untimed
    def run(cpus: Int, v: Variant, f: SparkSession => DataFrame): Double = {
      val s = session(cpus, v)
      force(f(s))
      val t0 = System.nanoTime(); force(f(s))
      val t = (System.nanoTime() - t0) / 1e9
      s.stop(); t
    }
    for ((stage, f) <- stages; v <- variants) {
      val bwBefore = membwGbps(32)
      val t32a = run(32, v, f); val t8 = run(8, v, f); val t32b = run(32, v, f)
      val bwAfter = membwGbps(32)
      val t32 = math.min(t32a, t32b)
      println(f"$stage%-10s ${v.name}%-18s t8=$t8%7.2fs t32=$t32%6.2fs " +
        f"eff=${t8 / t32 / 4}%.3f membw=[$bwBefore%.0f,$bwAfter%.0f]GB/s")
    }
  }
}
