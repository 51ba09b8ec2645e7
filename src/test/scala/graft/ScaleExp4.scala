package graft
object ScaleExp4 {
  def main(args: Array[String]): Unit = {
    val path = "/tmp/graft_bench_corpus_r300"
    ScaleExp.run(8, path); ScaleExp.run(2, path) // warm
    (1 to 3).foreach { i =>
      val t8 = ScaleExp.run(8, path); val t2 = ScaleExp.run(2, path)
      println(f"pair$i t8=$t8%.2f t2=$t2%.2f eff=${t2/t8/4}%.3f")
    }
  }
}
