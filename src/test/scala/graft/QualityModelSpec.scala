package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{LangId, QualityModel}

class QualityModelSpec extends AnyFunSuite {

  test("streaming scorer matches the dense meanFeaturize formulation") {
    val texts = Seq(
      "The house is on the hill and it is big",
      LangId.seeds("de").take(200),
      "日本語のテキストです",
      "ที่นี่มีคนมากมาย",
      "a",
      "buy cheap discount sale offer now")
    texts.foreach { t =>
      val expected = QualityModel.denseScore(t)
      assert(math.abs(QualityModel.score(t) - expected) < 1e-6,
        s"mismatch on: $t")
      // rerun: the streaming path is deterministic
      assert(QualityModel.score(t) == QualityModel.score(t))
    }
  }

  test("empty and blank text score 0.0") {
    assert(QualityModel.score(null) == 0.0)
    assert(QualityModel.score("") == 0.0)
    assert(QualityModel.score("   \t  ") == 0.0)
  }

  test("held-out golden corpus: prose scores high, style junk scores low") {
    // the golden fixtures are NOT in the training set (positives are the
    // langid seeds, negatives the frozen junk seeds) — this is a
    // generalization test. Style junk = nav menus (12), code blocks (13),
    // symbol soup (10). Repetition junk (stuffing 11/16, dup lines 8) is
    // EXPECTED to score prose-like: char n-grams cannot see repetition —
    // that is the heuristic repetition rules' job (scaladoc boundary).
    def cls(i: Int): Int =
      if (i >= 440) { if ((i - 440) % 10 == 9) 16 else 15 }
      else if (i >= 280) 14
      else if (i >= 240) 12 + (i % 2)
      else i % 12
    val proseCls = Set(0, 1, 2, 3, 4, 5, 6, 7, 14, 15)
    val junkCls = Set(10, 12, 13)
    var failures = List.empty[String]
    var nProse = 0
    var nJunk = 0
    (0 until 470).foreach { i =>
      val (_, raw, lang) = graft.sources.GoldenCorpus.doc(i)
      val c = cls(i)
      // PII prose (cls 7) is scored AFTER scrubbing — the pipeline's real
      // order — because the digit/id tail is (correctly) trained negative
      // and its gram mass competes with low-gram-count CJK prose
      val text = if (c == 7) graft.functions.Scrub.scrubString(raw) else raw
      val s = QualityModel.score(text)
      if (proseCls(c)) {
        nProse += 1
        if (s <= 0.5) failures ::= f"doc $i cls $c lang $lang PROSE scored $s%.4f"
      } else if (junkCls(c)) {
        nJunk += 1
        if (s >= 0.5) failures ::= f"doc $i cls $c JUNK scored $s%.4f"
      }
    }
    assert(nProse > 250 && nJunk > 50, s"fixture shape drifted: $nProse/$nJunk")
    assert(failures.isEmpty,
      s"${failures.length} misclassified:\n${failures.take(20).mkString("\n")}")
  }
}
