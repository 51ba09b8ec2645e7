package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Heuristics, Scrub, TextStats}

/** The fused single-pass TextStats UDF must be bit-identical to the pure
  * Column measures (the DuckDB oracles and golden labels are defined
  * against the Column formulas).
  */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "", "   \t  ", null,
    "spam spam spam spam spam",
    "line1\nline1\nline2\n  \nline3",
    "héllo wörld 日本語 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 🚀 emoji ñandú",
    "@#$% ^&*( #$@! 123 abc",
    "The Cat AND the dog WAS at THE house 42 times",
    "a b a b a b a b c d",
    "多 个 中文 字 的 测试 文本 在 这里",
    // combining marks (Mn/Mc) are word chars, not symbols: Devanagari
    // matras + nukta, vocalized Arabic harakat (round-5 symbol-class fix)
    "यह घर बहुत बड़ा है और बच्चे स्कूल में हैं",
    "المَدْرَسَةُ كَبِيرَةٌ جِدًّا هُنَا",
    // unsegmented no-space-script docs (round 6): zh/ja/th prose with no
    // inter-word spaces, stuffing, soup, and boundary mixes near the 30%
    // branch threshold
    "这是一个大的国家我们的生活每天都在变化人们在城市里工作和学习。",
    "日本の生活はとても便利ですが人々はいつも忙しいと言われています。",
    "ที่นี่มีคนมากมายและพวกเขาทำงานในเมืองใหญ่ทุกวัน",
    "便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买",
    "的※一★是☆在◆不■了〓有≡和※人★这☆中◆大■为〓上≡",
    "mixed latin 和一些中文 just below or above the threshold 的测试",
    "中文多过拉丁 the 的一是在不了有和人这中大为上个我以要他们",
    "ののの", "的的", "ん"
  )

  test("every stats-derived measure equals its Column twin, bit for bit") {
    val df = docs.toDF("text")
      .withColumn("__ts", TextStats.statsCol(col("text")))
    val measures = Seq(
      "doc_length" -> Heuristics.docLength(col("text")).cast("double"),
      "word_count" -> Heuristics.wordCount(col("text")).cast("double"),
      "token_count" -> Heuristics.tokenCount(col("text")).cast("double"),
      "symbol_word_ratio" -> Heuristics.symbolWordRatio(col("text")),
      "stopword_fraction" -> Heuristics.stopwordFraction(col("text")),
      "word_repetition_ratio" -> Heuristics.wordRepetitionRatio(col("text")),
      "dup_2gram_fraction" -> Heuristics.dup2gramFraction(col("text")),
      "dup_line_fraction" -> Heuristics.dupLineFraction(col("text")),
      "mean_word_length" -> Heuristics.meanWordLength(col("text")),
      "upper_fraction" -> Heuristics.upperFraction(col("text")),
      "digit_fraction" -> Heuristics.digitFraction(col("text")),
      "quality_score" -> Heuristics.qualityScore(col("text")),
      "script_nospace_fraction" -> Heuristics.scriptNoSpaceFraction(col("text")),
      "symbol_ratio_adaptive" -> Heuristics.symbolRatioAdaptive(col("text")),
      "stopword_fraction_adaptive" ->
        Heuristics.stopwordFractionAdaptive(col("text")),
      "repetition_adaptive" -> Heuristics.repetitionAdaptive(col("text")))
    measures.foreach { case (name, colTwin) =>
      val rows = df.select(colTwin.as("a"),
        TextStats.measure(name, col("__ts")).get.as("b"),
        col("text")).collect()
      rows.foreach { r =>
        val (a, b) = (r.getDouble(0), r.getDouble(1))
        assert(java.lang.Double.compare(a, b) == 0,
          s"$name mismatch on [${r.getString(2)}]: column=$a stats=$b")
      }
    }
  }

  test("fused pass equals Column twins on random unicode (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // chars across the interesting classes: ASCII alnum/punct/space,
    // accents, CJK, astral (surrogate pairs), lone spaces/newlines
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', ' ', '\t', '\n', '.', ',', '@', '#', '-'),
      2 -> Gen.oneOf('é', 'ñ', 'ß', '日', '本', '中', '½', 'Ⅷ', 'क', 'े', '़'),
      1 -> Gen.oneOf("🚀", "𝔘", "𝟗").map(_.charAt(0)) // high surrogates alone too
    )
    val textGen = Gen.chooseNum(0, 120)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val texts = (0 until 60).flatMap(i =>
      textGen(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq("🚀🚀 test 𝔘𝔫𝔦", "a🚀b", " \n ", "½½ ⅧⅧ 12")
    val df = texts.toDF("text")
      .withColumn("__ts", TextStats.statsCol(col("text")))
    Seq(
      "doc_length" -> Heuristics.docLength(col("text")).cast("double"),
      "word_count" -> Heuristics.wordCount(col("text")).cast("double"),
      "token_count" -> Heuristics.tokenCount(col("text")).cast("double"),
      "symbol_word_ratio" -> Heuristics.symbolWordRatio(col("text")),
      "upper_fraction" -> Heuristics.upperFraction(col("text")),
      "digit_fraction" -> Heuristics.digitFraction(col("text")),
      "mean_word_length" -> Heuristics.meanWordLength(col("text"))
    ).foreach { case (name, twin) =>
      df.select(twin.as("a"), TextStats.measure(name, col("__ts")).get.as("b"),
        col("text")).collect().foreach { r =>
        assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
          s"$name mismatch on [${r.getString(2)}]: " +
            s"column=${r.getDouble(0)} stats=${r.getDouble(1)}")
      }
    }
  }

  test("stopHits equals an independent split+lower+Set reference") {
    // stopwordFraction's Column twin now routes through the same static
    // hash table as the fused pass (the O(1) round-6 fix), so twin-vs-twin
    // equality no longer pins the stopword semantics by itself. This is
    // the independent reference: regex \s+ split, full-string ROOT
    // lowercase, plain Set membership — the semantics the DuckDB
    // `list_contains(stoplist, lower(x))` oracle implements.
    val stopSet = Heuristics.stopwords.toSet
    def reference(t: String): Int =
      t.split("\\s+").filter(_.nonEmpty)
        .count(w => stopSet.contains(w.toLowerCase(java.util.Locale.ROOT)))
    val mixed = docs.filter(_ != null) ++ Seq(
      "The AND Und DER la LE les ДА и В не 的 の に ที่ และ में के في من",
      "notastopword thethe aand thethe\tthe\nthe", // \s variants
      "ß İ ı DİE die", // locale-special folds must not invent hits
      (0 until 400).map(i => if (i % 3 == 0) "the" else s"w$i").mkString(" "))
    mixed.foreach { t =>
      assert(TextStats.stopHitsStr(t) == reference(t),
        s"stopHits mismatch on [$t]")
      // the native word counter equals the \s+-split reference too (it
      // replaced the ArrayFilter lambda as every ratio's denominator)
      assert(TextStats.wordCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)) ==
        t.split("\\s+").count(_.nonEmpty), s"wordCount mismatch on [$t]")
      // ... and the native repetition ratio equals the split+distinct
      // reference, bit for bit (same IEEE 1.0 - distinct/total)
      val wsRef = t.split("\\s+").filter(_.nonEmpty)
      val repRef = if (wsRef.isEmpty) 0.0
        else 1.0 - wsRef.distinct.length.toDouble / wsRef.length.toDouble
      assert(java.lang.Double.compare(TextStats.wordRepetition(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)), repRef) == 0,
        s"wordRepetition mismatch on [$t]")
    }
    // and the codegen'd expression agrees end-to-end, null included
    val rows = (mixed ++ Seq(null)).toDF("text")
      .select(graft.functions.TextScalarExpr(col("text"), "stop_hits"))
      .collect().map(_.getInt(0))
    assert(rows.toSeq == (mixed.map(reference) ++ Seq(0)))
  }

  test("script-adaptive statics equal independent references " +
    "(regex class, per-word replace, sliding distinct)") {
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    // independent formulations, deliberately different in style from the
    // production walkers — these are the semantics the DuckDB oracle
    // implements (regexp class count, length-minus-replace coverage,
    // list_distinct 4-grams)
    val nsClass = ("[\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}" +
      "\\x{4E00}-\\x{9FFF}\\x{F900}-\\x{FAFF}\\x{0E01}-\\x{0E4E}]").r
    def nsRef(t: String): Int = nsClass.findAllIn(t).length
    def coverRef(t: String): Int = TextStats.noSpaceStopwords.map { w =>
      t.length - t.replace(w, "").length
    }.sum
    def c4Ref(t: String): Double = {
      val cps = t.codePoints().toArray.toSeq
      val grams = cps.sliding(4).filter(_.size == 4).toSeq
      if (grams.isEmpty) 0.0
      else (grams.size - grams.distinct.size).toDouble / grams.size
    }
    docs.filter(_ != null).foreach { t =>
      assert(TextStats.noSpaceCount(u(t)) == nsRef(t), s"nospace [$t]")
      assert(TextStats.noSpaceStopCover(u(t)) == coverRef(t), s"cover [$t]")
      assert(java.lang.Double.compare(
        TextStats.char4DupFraction(u(t)), c4Ref(t)) == 0, s"char4 [$t]")
    }
    // nulls come through the codegen'd expressions as empty
    val r = Seq[String](null).toDF("text").select(
      graft.functions.TextScalarExpr(col("text"), "nospace_count"),
      graft.functions.TextScalarExpr(col("text"), "nospace_stop_cover"),
      graft.functions.TextScalarExpr(col("text"), "char4_dup_fraction"))
      .head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 0 && r.getDouble(2) == 0.0)
  }

  test("scrubFast (one-pass UDF) equals the regexp_replace chain, byte for byte") {
    val piiDocs = docs ++ Seq(
      "mail a@b.co call 555-123-4567 or (212) 555-1234 ssn 123-45-6789 " +
        "card 4111 1111 1111 1111 ip 10.0.0.1 bullshit")
    val rows = piiDocs.toDF("text")
      .select(Scrub.scrub(col("text")), Scrub.scrubFast(col("text"))).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("golden labels are unchanged by the fused path (spot invariant)") {
    // the full GoldenSpec covers this end-to-end; here: stats path on the
    // fixture corpus produces the same keep verdicts as the Column path
    val pages = graft.sources.GoldenCorpus.generate(spark, 48)
    val fused = graft.operators.QualityFilter.run(pages,
      graft.operators.QualityFilter.heuristicRules)
      .select("url", "keep").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val columnPath = pages
      .withColumn("keep", graft.operators.QualityFilter
        .ruleVerdicts(graft.operators.QualityFilter.heuristicRules, None)
        .map(_._2).reduce(_ && _))
      .select("url", "keep").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(fused == columnPath)
  }
}
