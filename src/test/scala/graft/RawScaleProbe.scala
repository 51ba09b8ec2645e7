package graft
/** Raw JVM thread-scaling of the fused scorer (no Spark): each thread
  * scores the same doc set in a loop. Separates code scaling from Spark
  * overhead and host contention. */
object RawScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text").collect().map(_.getString(0))
    spark.stop()
    val utf8 = texts.map(org.apache.spark.unsafe.types.UTF8String.fromString)
    def work(reps: Int): Unit = {
      var r = 0
      while (r < reps) {
        var i = 0
        while (i < utf8.length) {
          graft.functions.FusedScorer.score(utf8(i), true); i += 1
        }
        r += 1
      }
    }
    def docsPerSec(threads: Int, reps: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map(_ => new Thread(() => work(reps)))
      ts.foreach(_.start()); ts.foreach(_.join())
      threads.toLong * reps * utf8.length / ((System.nanoTime()-t0)/1e9)
    }
    docsPerSec(4, 2) // JIT warm
    (1 to 2).foreach { i =>
      val d8 = docsPerSec(8, 6)
      val d32 = docsPerSec(32, 6)
      println(f"pair$i raw8=${d8/1000}%.0fk/s raw32=${d32/1000}%.0fk/s eff=${d32/d8/4}%.3f")
    }
  }
}
