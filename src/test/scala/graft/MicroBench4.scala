package graft
import java.util.regex.Pattern
object MicroBench4 {
  def main(args: Array[String]): Unit = {
    val docs = (0 until 240).map(i => graft.sources.GoldenCorpus.doc(i)._2).toArray
    val perThread = 50000
    def bench(label: String)(mk: () => (String => Int), threads: Int): Unit = {
      val warm = mk(); (0 until 2000).foreach(i => warm(docs(i % 240)))
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { tid =>
        new Thread(() => {
          val fn = mk()
          var i = 0
          while (i < perThread) { fn(docs((i + tid) % 240)); i += 1 }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      println(f"$label x$threads: ${threads * perThread / ((System.nanoTime() - t0) / 1e9)}%.0f docs/sec")
    }
    def freshPat() = {
      val p = Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
      (t: String) => { var n = 0; val m = p.matcher(t); while (m.find()) n += 1; n }
    }
    bench("freshPat")(freshPat, 1)
    bench("freshPat")(freshPat, 32)
    def hand() = (t: String) => {
      var n = 0; var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
          n += 1; i += 1
          while (i < t.length && { val d = t.charAt(i); (d >= 'A' && d <= 'Z') || (d >= 'a' && d <= 'z') }) i += 1
        } else if (c >= '0' && c <= '9') {
          n += 1; i += 1
          while (i < t.length && { val d = t.charAt(i); d >= '0' && d <= '9' }) i += 1
        } else if (c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r') i += 1
        else {
          n += 1
          i += Character.charCount(t.codePointAt(i))
        }
      }
      n
    }
    bench("hand")(hand, 1)
    bench("hand")(hand, 32)
    val p = freshPat(); val h = hand()
    docs.foreach(d => assert(p(d) == h(d), s"mismatch on ${d.take(40)}"))
    println("hand == regex on all fixture docs")
  }
}
