package graft
object OverheadExp {
  def main(args: Array[String]): Unit = {
    def t(body: => Unit): Double = { val t0=System.nanoTime(); body; (System.nanoTime()-t0)/1e9 }
    val path = "/tmp/graft_bench_corpus_r300"
    val tSess = t {
      val s = ScaleExp.session(8); s.stop()
    }
    val s = ScaleExp.session(8)
    val tRead = t { s.read.parquet(path) }
    val df = ScaleExp.job(s, path)
    val tPlan = t { df.queryExecution.executedPlan }
    val tRun1 = t { ScaleExp.force(df) }
    val tRun2 = t { ScaleExp.force(ScaleExp.job(s, path)) }
    val tRun3 = t { ScaleExp.force(ScaleExp.job(s, path)) }
    val tEmpty = t { ScaleExp.force(s.read.parquet(path).limit(0)) }
    println(f"sess=$tSess%.2f read=$tRead%.2f plan=$tPlan%.2f run1=$tRun1%.2f run2=$tRun2%.2f run3=$tRun3%.2f emptyjob=$tEmpty%.2f")
    s.stop()
  }
}
