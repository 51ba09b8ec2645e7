package graft
object CpuProbe {
  def main(args: Array[String]): Unit = {
    def burn(iters: Long): Long = {
      var x = 1469598103934665603L
      var i = 0L
      while (i < iters) { x ^= i; x *= 1099511628211L; i += 1 }
      x
    }
    def run(threads: Int): Double = {
      val per = 800000000L
      val t0 = System.nanoTime()
      val ts = (0 until threads).map(_ => new Thread(() => { burn(per); () }))
      ts.foreach(_.start()); ts.foreach(_.join())
      threads * per / ((System.nanoTime() - t0) / 1e9) / 1e9
    }
    run(2) // warm
    for (t <- Seq(1, 8, 32)) println(f"threads=$t: ${run(t)}%.2f Gops")
    for (t <- Seq(1, 8, 32)) println(f"threads=$t: ${run(t)}%.2f Gops (repeat)")
  }
}
