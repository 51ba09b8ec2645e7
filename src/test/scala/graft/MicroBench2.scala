package graft
object MicroBench2 {
  def main(args: Array[String]): Unit = {
    val docs = (0 until 240).map(i => graft.sources.GoldenCorpus.doc(i)._2).toArray
    val perThread = 20000
    def run(threads: Int, fn: String => Any, label: String): Unit = {
      // warm
      (0 until 2000).foreach(i => fn(docs(i % 240)))
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { tid =>
        new Thread(() => {
          var i = 0
          while (i < perThread) { fn(docs((i + tid) % 240)); i += 1 }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label x$threads: ${threads * perThread / sec}%.0f docs/sec total")
    }
    for (t <- Seq(1, 8, 32)) run(t, graft.functions.TextStats.compute, "stats")
    for (t <- Seq(1, 8, 32)) run(t, graft.functions.LangId.predict, "langid")
  }
}
