package graft
object ScaleExp {
  def session(cpus: Int) = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName(s"exp-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (1<<21).toString)
      .config("spark.sql.files.openCostInBytes","0")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def job(s: org.apache.spark.sql.SparkSession, path: String) =
    graft.operators.QualityFilter.run(s.read.parquet(path))
      .select("url","keep","fail_reasons","scrubbed_text","lang_pred","ppl")
  def run(cpus: Int, path: String): Double = {
    val s = session(cpus)
    force(job(s, path))
    val t0 = System.nanoTime(); force(job(s, path))
    val t = (System.nanoTime()-t0)/1e9
    s.stop(); t
  }
  def main(args: Array[String]): Unit = {
    val rep = args(0).toInt
    val path = s"/tmp/graft_bench_corpus_r$rep"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      val s = session(32)
      graft.sources.Pages.loadReplicated(s, "/root/testdata/sf0.1", rep)
        .write.mode("overwrite").parquet(path)
      s.stop()
    }
    (1 to 2).foreach { i =>
      val t32 = run(32, path); val t8 = run(8, path)
      println(f"rep=$rep pair$i t32=$t32%.2f t8=$t8%.2f eff=${t8/t32/4}%.3f")
    }
  }
}
