package graft
object MicroBench {
  def main(args: Array[String]): Unit = {
    import graft.functions.{LangId, Perplexity}
    val docs = (0 until 20000).map(i => graft.sources.GoldenCorpus.doc(i % 240)._2)
    // warm up
    docs.take(2000).foreach(d => LangId.predict(d))
    var t0 = System.nanoTime()
    docs.foreach(d => LangId.predict(d))
    println(f"langid: ${20000 / ((System.nanoTime()-t0)/1e9)}%.0f docs/sec/core")
    t0 = System.nanoTime()
    docs.foreach(d => Perplexity.perplexity(d))
    println(f"ppl: ${20000 / ((System.nanoTime()-t0)/1e9)}%.0f docs/sec/core")
  }
}
