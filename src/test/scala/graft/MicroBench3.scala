package graft
import java.util.regex.Pattern
object MicroBench3 {
  val tokenPat = Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
  val symbolPat = Pattern.compile("[^\\p{L}\\p{N}\\s]")
  def main(args: Array[String]): Unit = {
    val docs = (0 until 240).map(i => graft.sources.GoldenCorpus.doc(i)._2).toArray
    val perThread = 50000
    def run(threads: Int, fn: String => Any, label: String): Unit = {
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
      println(f"$label x$threads: ${threads * perThread / sec}%.0f docs/sec")
    }
    def tokens(t: String): Int = { var n=0; val m=tokenPat.matcher(t); while (m.find()) n+=1; n }
    def symbols(t: String): Int = { var n=0; val m=symbolPat.matcher(t); while (m.find()) n+=1; n }
    def charloop(t: String): Int = { var n=0; var i=0; while (i<t.length) { if (t.charAt(i)==' ') n+=1; i+=1 }; n }
    for (t <- Seq(1, 32)) run(t, tokens, "tokenPat")
    for (t <- Seq(1, 32)) run(t, symbols, "symbolPat")
    for (t <- Seq(1, 32)) run(t, charloop, "charloop")
  }
}
