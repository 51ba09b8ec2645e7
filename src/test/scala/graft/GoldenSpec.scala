package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BASELINE.md headline gate: keep/drop F1 >= 0.99 vs the committed
  * reference labels (src/test/resources/golden_verdicts.csv) and
  * byte-identical scrubbed text per url (compared via md5), on the
  * deterministic fixture corpus. Regenerate labels only deliberately, via
  * `sbt "Test/runMain graft.GoldenWriter"`, and review the diff.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val golden: Map[String, (Boolean, String, String, String, Double)] = {
    val src = scala.io.Source.fromFile("src/test/resources/golden_verdicts.csv")
    try {
      val lines = src.getLines().toList
      lines.tail.map { l =>
        val c = l.split(",", -1)
        c(0) -> ((c(1).toBoolean, c(2), c(3), c(4), c(5).toDouble))
      }.toMap
    } finally src.close()
  }

  private lazy val computed = graft.operators.QualityFilter.run(
    graft.sources.GoldenCorpus.generate(spark).repartition(7))
    .select(col("url"), col("keep"),
      concat_ws("|", col("fail_reasons")).as("fr"),
      md5(col("scrubbed_text")).as("smd5"),
      col("lang_pred"), round(col("ppl"), 4).as("ppl"))
    .collect()
    .map(r => r.getString(0) -> ((r.getBoolean(1), r.getString(2),
      r.getString(3), r.getString(4), r.getDouble(5)))).toMap

  test("keep/drop F1 >= 0.99 vs committed reference labels") {
    assert(computed.keySet == golden.keySet)
    var tp = 0; var fp = 0; var fn = 0
    golden.foreach { case (url, (gKeep, _, _, _, _)) =>
      val cKeep = computed(url)._1
      if (cKeep && gKeep) tp += 1
      else if (cKeep && !gKeep) fp += 1
      else if (!cKeep && gKeep) fn += 1
    }
    val precision = tp.toDouble / math.max(tp + fp, 1)
    val recall = tp.toDouble / math.max(tp + fn, 1)
    val f1 = 2 * precision * recall / math.max(precision + recall, 1e-9)
    info(f"F1 = $f1%.4f (tp=$tp fp=$fp fn=$fn)")
    assert(f1 >= 0.99, f"F1 $f1%.4f below 0.99")
  }

  test("scrubbed text is byte-identical per url (md5)") {
    val bad = golden.collect {
      case (url, (_, _, gMd5, _, _)) if computed(url)._3 != gMd5 => url
    }
    assert(bad.isEmpty, s"scrub mismatch for ${bad.take(5)}")
  }

  test("fail_reasons and language predictions match the labels exactly") {
    val frBad = golden.collect {
      case (url, (_, gFr, _, _, _)) if computed(url)._2 != gFr => url }
    assert(frBad.isEmpty, s"fail_reasons mismatch for ${frBad.take(5)}")
    val lpBad = golden.collect {
      case (url, (_, _, _, gLp, _)) if computed(url)._4 != gLp => url }
    assert(lpBad.isEmpty, s"lang_pred mismatch for ${lpBad.take(5)}")
  }

  test("perplexity scores reproduce to 4 decimals") {
    val bad = golden.collect {
      case (url, (_, _, _, _, gPpl))
        if math.abs(computed(url)._5 - gPpl) > 1e-9 => url }
    assert(bad.isEmpty, s"ppl mismatch for ${bad.take(5)}")
  }

  test("web-junk classes are dropped: nav-menu boilerplate and code blocks") {
    val v = graft.operators.QualityFilter.run(
      graft.sources.GoldenCorpus.generate(spark))
      .select(col("url"), col("keep"), col("fail_reasons")).collect()
      .map(r => r.getString(0).split("/").last.toInt ->
        ((r.getBoolean(1), r.getSeq[String](2))))
      .filter(p => p._1 >= 240 && p._1 < 280)
    assert(v.length == 40)
    v.foreach { case (idx, (keep, reasons)) =>
      assert(!keep, s"web-junk doc $idx kept (reasons=$reasons)")
    }
    // the drop reasons are the EXPECTED ones per class
    val navReasons = v.filter(_._1 % 2 == 0).flatMap(_._2._2).toSet
    val codeReasons = v.filter(_._1 % 2 == 1).flatMap(_._2._2).toSet
    assert(navReasons.contains("max_dup_line_fraction") ||
      navReasons.contains("min_stopword_fraction"), s"nav: $navReasons")
    assert(codeReasons.contains("max_symbol_word_ratio") ||
      codeReasons.contains("min_stopword_fraction"), s"code: $codeReasons")
  }

  test("unsegmented zh/ja/th prose is KEPT; unsegmented stuffing dropped " +
    "by the char-based repetition twin") {
    // the round-6 block (idx >= 440) has NO fixture pre-segmentation —
    // this is the shape real Common-Crawl no-space-script pages have.
    // Before the script-adaptive rules, every one of these clean docs was
    // dropped wholesale (stopword fraction ~0 on one giant "word").
    val v = graft.operators.QualityFilter.run(
      graft.sources.GoldenCorpus.generate(spark))
      .select(col("url"), col("keep"), col("fail_reasons"),
        col("lang"), col("lang_pred")).collect()
      .map(r => r.getString(0).split("/").last.toInt ->
        ((r.getBoolean(1), r.getSeq[String](2), r.getString(3),
          r.getString(4))))
      .filter(_._1 >= 440)
    assert(v.length == 30)
    v.foreach { case (idx, (keep, reasons, lang, langPred)) =>
      if ((idx - 440) % 10 == 9)
        assert(!keep && reasons.contains("max_word_repetition"),
          s"unsegmented stuffing doc $idx not dropped by repetition " +
            s"(keep=$keep reasons=$reasons)")
      else {
        assert(keep, s"unsegmented clean $lang doc $idx dropped " +
          s"(reasons=$reasons)")
        // langid needs no segmentation either (char n-grams)
        assert(langPred == lang,
          s"unsegmented doc $idx lang_pred=$langPred != $lang")
      }
    }
  }

  test("langid accuracy on clean-prose fixture classes is 100%") {
    val v = graft.operators.QualityFilter.run(
      graft.sources.GoldenCorpus.generate(spark))
      .select(col("url"), col("lang"), col("lang_pred")).collect()
    val prose = v.filter { r =>
      val idx = r.getString(0).split("/").last.toInt
      // clean-prose classes only: the round-6 unsegmented block keeps its
      // every-10th keyword-stuffing doc (class 16) out — spam has no
      // meaningful language label
      (idx < 240 && idx % 12 <= 5) ||
        (idx >= 280 && !(idx >= 440 && (idx - 440) % 10 == 9))
    }
    val acc = prose.count(r => r.getString(1) == r.getString(2)).toDouble /
      prose.length
    assert(acc == 1.0, f"clean-prose langid accuracy $acc%.3f")
  }
}
