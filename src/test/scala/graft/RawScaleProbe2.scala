package graft
object RawScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text").collect().map(_.getString(0))
    spark.stop()
    val utf8 = texts.map(org.apache.spark.unsafe.types.UTF8String.fromString)
    @volatile var sink: Any = null
    val variants: Seq[(String, Int => Unit)] = Seq(
      "toString" -> (i => sink = utf8(i).toString),
      "stats"    -> (i => sink = graft.functions.TextStats.compute(texts(i))),
      "scrub"    -> (i => sink = graft.functions.Scrub.scrubString(texts(i))),
      "langid"   -> (i => sink = graft.functions.LangId.predict(texts(i))),
      "ppl"      -> (i => sink = graft.functions.Perplexity.perplexity(texts(i)))
    )
    def docsPerSec(threads: Int, reps: Int, f: Int => Unit): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map(_ => new Thread(() => {
        var r = 0
        while (r < reps) { var i = 0; while (i < texts.length) { f(i); i += 1 }; r += 1 }
      }))
      ts.foreach(_.start()); ts.foreach(_.join())
      threads.toLong * reps * texts.length / ((System.nanoTime()-t0)/1e9)
    }
    variants.foreach { case (n, f) => docsPerSec(4, 3, f) } // warm all
    variants.foreach { case (n, f) =>
      val d8 = docsPerSec(8, 8, f)
      val d32 = docsPerSec(32, 8, f)
      println(f"$n%-9s raw8=${d8/1000}%8.0fk/s raw32=${d32/1000}%8.0fk/s eff=${d32/d8/4}%.3f")
    }
  }
}
