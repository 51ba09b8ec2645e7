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
    "المَدْرَسَةُ كَبِيرَةٌ جِدًّا هُنَا"
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
      "quality_score" -> Heuristics.qualityScore(col("text")))
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
    }
    // and the codegen'd expression agrees end-to-end, null included
    val rows = (mixed ++ Seq(null)).toDF("text")
      .select(graft.functions.TextScalarExpr(col("text"), "stop_hits"))
      .collect().map(_.getInt(0))
    assert(rows.toSeq == (mixed.map(reference) ++ Seq(0)))
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
