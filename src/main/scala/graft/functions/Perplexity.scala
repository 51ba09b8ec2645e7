package graft.functions

/** KenLM-style n-gram language-model perplexity, reduced to a character
  * bigram model with add-one smoothing over a 128-symbol ASCII-folded
  * alphabet. The count table is derived at class-init from the frozen
  * LangId English seed corpus, so it is identical on every executor JVM
  * (no broadcast, no files, fully deterministic).
  *
  * ppl(text) = exp(-1/N * sum_i log P(c_i | c_{i-1})). Natural-language
  * text lands in a low band; symbol soup / random strings score high —
  * which is exactly how the quality filter consumes it (a `between` check,
  * cf. reference condition semantics weiser/checks/base.py:62-69).
  */
object Perplexity extends Serializable {

  private val V = 128

  /** Map a char into the model alphabet: ASCII lowercased, everything
    * else folded to byte 1 (an "unknown" symbol).
    */
  @inline private def sym(c: Char): Int = {
    val lc = Character.toLowerCase(c)
    if (lc < 128) lc.toInt else 1
  }

  private lazy val logProb: Array[Double] = {
    val counts = Array.fill(V * V)(1.0) // add-one smoothing
    val rowSum = Array.fill(V)(V.toDouble)
    val corpus = " " + Seq("en", "es", "fr", "de")
      .map(l => LangId.seeds(l)).mkString(" ") + " "
    var i = 1
    while (i < corpus.length) {
      val a = sym(corpus.charAt(i - 1))
      val b = sym(corpus.charAt(i))
      counts(a * V + b) += 1.0
      rowSum(a) += 1.0
      i += 1
    }
    val lp = new Array[Double](V * V)
    var a = 0
    while (a < V) {
      var b = 0
      while (b < V) {
        lp(a * V + b) = math.log(counts(a * V + b) / rowSum(a))
        b += 1
      }
      a += 1
    }
    lp
  }

  /** Per-document perplexity; empty/null text -> positive infinity band
    * sentinel (1e9) so length-zero docs fail any between-band check.
    */
  def perplexity(text: String): Double = {
    if (text == null || text.isEmpty) return 1e9
    // virtual " text " padding — no per-document copy (allocation rate is
    // the pipeline's scaling ceiling at 32 threads, not arithmetic)
    var sum = 0.0
    var prev = ' '.toInt
    var i = 0
    while (i < text.length) {
      val cur = sym(text.charAt(i))
      sum += logProb(prev * V + cur)
      prev = cur
      i += 1
    }
    sum += logProb(prev * V + ' '.toInt)
    math.exp(-sum / (text.length + 1))
  }
}
