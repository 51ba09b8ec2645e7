package graft

/** Drives graft.Main end-to-end like spark-submit would: writes a pages
  * parquet, runs the job, kills it via env-free rerun semantics, checks
  * output + summary. Kept as a runnable (not a suite) because Main owns
  * its own SparkSession lifecycle.
  */
object MainSmoke {
  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("mainsmoke").toString
    val prep = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    graft.sources.Pages.load(prep, "/root/testdata/sf0.001")
      .write.parquet(s"$tmp/pages")
    prep.stop()
    Main.main(Array(s"$tmp/pages", s"$tmp/out", s"$tmp/metrics", "smoke1", "4"))
    val check = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    val n = check.read.parquet(s"$tmp/out").count()
    val m = check.read.parquet(s"$tmp/metrics").count()
    println(s"MAINSMOKE verdicts=$n metrics=$m")
    assert(n == 500 && m > 0)
    check.stop()
  }
}
