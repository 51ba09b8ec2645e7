package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{LangId, Perplexity}

/** Bit-parity pin for the round-4 compact perplexity table: the 29-symbol
  * compact indexing must produce EXACTLY the values of the full 128^3
  * formulation it replaced (same counts, same smoothing constants, only
  * the storage changed). The reference below IS the round-3
  * implementation, kept verbatim as test-side code.
  */
class PplCompactSpec extends AnyFunSuite {

  private val V = 128
  private val L3 = 0.6
  private val L2 = 0.3
  private val L1 = 0.1

  @inline private def sym(c: Char): Int = {
    val lc = Character.toLowerCase(c)
    if (lc < 128) lc.toInt else 1
  }

  /** The round-3 full-table model, verbatim. */
  private lazy val fullLogProb: Array[Float] = {
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
        val p1 = (c1(c) + 1.0) / (n1 + V)
        lp(ab * V + c) = math.log(L3 * p3 + L2 * p2 + L1 * p1).toFloat
        c += 1
      }
      ab += 1
    }
    lp
  }

  private def fullPerplexity(text: String): Double = {
    if (text == null || text.isEmpty) return 1e9
    var sum = 0.0
    var p2 = ' '.toInt
    var p1 = ' '.toInt
    var i = 0
    while (i < text.length) {
      val cur = sym(text.charAt(i))
      sum += fullLogProb((p2 * V + p1) * V + cur)
      p2 = p1
      p1 = cur
      i += 1
    }
    sum += fullLogProb((p2 * V + p1) * V + ' '.toInt)
    math.exp(-sum / (text.length + 1))
  }

  test("compact table is bit-identical to the 128^3 formulation on every " +
    "text class (prose, soup, digits/punctuation OOV, non-ASCII, mixed)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "la casa de los niños es muy grande",
      "das ist ein ganz normaler deutscher satz",
      "@@@ ### $$$ ;;; !!! %%% ^^^ &&& *** ((()))",       // pure OOV soup
      "call 555-123-4567 or email a@b.com: 42% off!!",    // digits+punct OOV
      "我们的房子很大他们在学校学习中文",                      // all non-ASCII fold
      "mixed 中文 and english with 123 numbers, ok?",
      "x",                                                 // single char
      " ",                                                 // single space
      "ação coração não",                                  // accent folds
      (0 until 127).map(_.toChar).mkString                 // every ASCII code
    )
    texts.foreach { t =>
      val full = fullPerplexity(t)
      val compact = Perplexity.perplexity(t)
      assert(java.lang.Double.doubleToRawLongBits(full) ==
        java.lang.Double.doubleToRawLongBits(compact),
        s"ppl diverged on '${t.take(40)}': full=$full compact=$compact")
    }
    // random ASCII fuzz: 200 strings over the full byte range
    val rnd = new scala.util.Random(20260817L)
    (0 until 200).foreach { _ =>
      val t = Array.fill(1 + rnd.nextInt(300))(rnd.nextInt(128).toChar).mkString
      assert(fullPerplexity(t) == Perplexity.perplexity(t), s"fuzz: '${t.take(40)}'")
    }
  }
}
