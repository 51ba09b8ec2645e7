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
  * precomputed per trigram over the COMPACT used-symbol alphabet (~97 KB,
  * L2-resident — see `model` below; bit-identical to the full 128^3
  * indexing): scoring stays ONE table lookup per character.
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

  /** COMPACT symbol alphabet (round 4 — the memory-traffic fix). The
    * model alphabet is nominally 128 ASCII-folded symbols, but the frozen
    * seed corpus touches only 28 of them (space, a-z, the non-ASCII fold
    * symbol); every other symbol has zero counts in every table, and the
    * interpolated probability of ANY zero-count symbol is the same
    * context-free add-one floor. Merging all unused symbols into one OOV
    * id therefore changes NOTHING about the computed values — the count
    * arithmetic and the smoothing constants (V stays 128 in the
    * formulas) are untouched, only the table INDEXING changes — but it
    * shrinks the lookup table from 128^3 floats = 8 MB (L3-resident,
    * fighting every neighbor on a shared box) to 29^3 ≈ 97 KB
    * (L2-resident per core). Scoring is still one table lookup per
    * character plus one 128-byte map read. Bit-parity with the 8 MB
    * formulation is pinned by PplCompactSpec and the frozen goldens.
    */
  private lazy val model: (Array[Byte], Array[Float], Int) = {
    val corpus = "  " + LangId.langs.map(LangId.seeds).mkString(" ") + " "
    // dense ids for the symbols the corpus actually uses; one extra OOV
    // id for everything else
    val used = new Array[Boolean](V)
    corpus.foreach(c => used(sym(c)) = true)
    val symId = new Array[Byte](V)
    var k = 0
    var s = 0
    while (s < V) {
      if (used(s)) { symId(s) = k.toByte; k += 1 }
      s += 1
    }
    val oov = k
    val K = k + 1
    // symId is Array[Byte]: a seed-corpus expansion pushing the used-ASCII
    // count past 127 would overflow the signed-byte ids silently and corrupt
    // every table lookup. Fail loudly instead (switch to Array[Short] then).
    require(K <= 127, s"perplexity symbol alphabet K=$K exceeds signed-byte id range")
    s = 0
    while (s < V) { if (!used(s)) symId(s) = oov.toByte; s += 1 }
    // counts in compact space; the corpus contains only used symbols, so
    // every OOV row/column keeps the exact zero counts it had at V=128
    val c3 = new Array[Int](K * K * K)
    val c2 = new Array[Int](K * K)
    val c1 = new Array[Int](K)
    var i = 2
    while (i < corpus.length) {
      val a = symId(sym(corpus.charAt(i - 2)))
      val b = symId(sym(corpus.charAt(i - 1)))
      val c = symId(sym(corpus.charAt(i)))
      c3((a * K + b) * K + c) += 1
      c2(b * K + c) += 1
      c1(c) += 1
      i += 1
    }
    val ctx3 = new Array[Int](K * K)
    var j = 0
    while (j < c3.length) { ctx3(j / K) += c3(j); j += 1 }
    val ctx2 = new Array[Int](K)
    j = 0
    while (j < c2.length) { ctx2(j / K) += c2(j); j += 1 }
    val n1 = c1.sum
    val lp = new Array[Float](K * K * K)
    var ab = 0
    while (ab < K * K) {
      val b = ab % K
      var c = 0
      while (c < K) {
        val p3 = if (ctx3(ab) > 0) c3(ab * K + c).toDouble / ctx3(ab) else 0.0
        val p2 = if (ctx2(b) > 0) c2(b * K + c).toDouble / ctx2(b) else 0.0
        // V (=128), NOT K, stays the add-one denominator: the probability
        // model is unchanged, only its storage is compacted
        val p1 = (c1(c) + 1.0) / (n1 + V)
        lp(ab * K + c) = math.log(L3 * p3 + L2 * p2 + L1 * p1).toFloat
        c += 1
      }
      ab += 1
    }
    (symId, lp, K)
  }

  /** Per-document perplexity; empty/null text -> positive infinity band
    * sentinel (1e9) so length-zero docs fail any between-band check.
    */
  def perplexity(text: String): Double = {
    if (text == null || text.isEmpty) return 1e9
    val (symId, logProb, k) = model
    // virtual "  text " padding — no per-document copy (allocation rate is
    // the pipeline's scaling ceiling at 32 threads, not arithmetic)
    var sum = 0.0
    var p2: Int = symId(' '.toInt)
    var p1: Int = p2
    var i = 0
    while (i < text.length) {
      val cur: Int = symId(sym(text.charAt(i)))
      sum += logProb((p2 * k + p1) * k + cur)
      p2 = p1
      p1 = cur
      i += 1
    }
    sum += logProb((p2 * k + p1) * k + symId(' '.toInt))
    math.exp(-sum / (text.length + 1))
  }
}
