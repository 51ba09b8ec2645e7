package graft.functions

/** KenLM-style n-gram language-model perplexity: an interpolated character
  * TRIGRAM model (round 3 — was a char bigram with add-one smoothing) over
  * a 128-symbol ASCII-folded alphabet.
  *
  *   P(c | ab) = l3*P3_mle(c|ab) + l2*P2_mle(c|b) + l1*P1_addone(c)
  *
  * — the classic Jelinek-Mercer interpolation shape KenLM's backoff models
  * approximate: the trigram term carries the orthographic signal where the
  * context was seen, the bigram catches unseen trigram contexts, and the
  * add-one unigram floor keeps every log finite (so no double smoothing of
  * the higher orders, unlike the old add-one bigram whose probability mass
  * was dominated by the smoothing prior for rare contexts).
  *
  * The tables are derived at class-init from the frozen multilingual
  * LangId seed corpora (all ten languages; non-ASCII folds to one
  * "unknown" symbol, which deliberately gives non-Latin scripts a
  * well-trained degenerate band instead of a smoothing-floor blowup), so
  * every executor JVM materializes identical weights — no broadcast, no
  * model files, fully deterministic. The interpolated log-prob is
  * precomputed per trigram: scoring stays ONE table lookup per character,
  * exactly the cost of the old bigram model.
  *
  * ppl(text) = exp(-1/N * sum_i log P(c_i | c_{i-2} c_{i-1})). Natural
  * text lands in a low band; symbol soup / random strings score high —
  * which is how the quality filter consumes it (a `between` check, cf.
  * reference condition semantics weiser/checks/base.py:62-69).
  */
object Perplexity extends Serializable {

  private val V = 128
  private val L3 = 0.6
  private val L2 = 0.3
  private val L1 = 0.1

  /** Map a char into the model alphabet: ASCII lowercased, everything
    * else folded to byte 1 (an "unknown" symbol).
    */
  @inline private def sym(c: Char): Int = {
    val lc = Character.toLowerCase(c)
    if (lc < 128) lc.toInt else 1
  }

  /** Precomputed log of the interpolated trigram probability, indexed
    * (a*V + b)*V + c. 128^3 floats = 8 MB, shared per JVM.
    */
  private lazy val logProb: Array[Float] = {
    val c3 = new Array[Int](V * V * V)
    val c2 = new Array[Int](V * V)
    val c1 = new Array[Int](V)
    val corpus = "  " + LangId.langs.map(LangId.seeds).mkString(" ") + " "
    var i = 2
    while (i < corpus.length) {
      val a = sym(corpus.charAt(i - 2))
      val b = sym(corpus.charAt(i - 1))
      val c = sym(corpus.charAt(i))
      c3((a * V + b) * V + c) += 1
      c2(b * V + c) += 1
      c1(c) += 1
      i += 1
    }
    // context totals for the MLE terms
    val ctx3 = new Array[Int](V * V)
    var j = 0
    while (j < c3.length) { ctx3(j / V) += c3(j); j += 1 }
    val ctx2 = new Array[Int](V)
    j = 0
    while (j < c2.length) { ctx2(j / V) += c2(j); j += 1 }
    val n1 = c1.sum
    val lp = new Array[Float](V * V * V)
    var ab = 0
    while (ab < V * V) {
      val b = ab % V
      var c = 0
      while (c < V) {
        val p3 = if (ctx3(ab) > 0) c3(ab * V + c).toDouble / ctx3(ab) else 0.0
        val p2 = if (ctx2(b) > 0) c2(b * V + c).toDouble / ctx2(b) else 0.0
        val p1 = (c1(c) + 1.0) / (n1 + V) // add-one floor keeps log finite
        lp(ab * V + c) = math.log(L3 * p3 + L2 * p2 + L1 * p1).toFloat
        c += 1
      }
      ab += 1
    }
    lp
  }

  /** Per-document perplexity; empty/null text -> positive infinity band
    * sentinel (1e9) so length-zero docs fail any between-band check.
    */
  def perplexity(text: String): Double = {
    if (text == null || text.isEmpty) return 1e9
    // virtual "  text " padding — no per-document copy (allocation rate is
    // the pipeline's scaling ceiling at 32 threads, not arithmetic)
    var sum = 0.0
    var p2 = ' '.toInt
    var p1 = ' '.toInt
    var i = 0
    while (i < text.length) {
      val cur = sym(text.charAt(i))
      sum += logProb((p2 * V + p1) * V + cur)
      p2 = p1
      p1 = cur
      i += 1
    }
    sum += logProb((p2 * V + p1) * V + ' '.toInt)
    math.exp(-sum / (text.length + 1))
  }
}
