package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Heuristics, LangId, Perplexity, Scrub}

class ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("text").select(Scrub.scrub(col("text"))).head().getString(0)

  test("PII patterns are replaced, byte-exact") {
    assert(scrub("mail me at john.doe+x@sub.example.co right now") ==
      "mail me at <EMAIL> right now")
    assert(scrub("card 4111 1111-1111 1111 ok") == "card <CC> ok")
    assert(scrub("ssn 123-45-6789.") == "ssn <SSN>.")
    assert(scrub("call 555-123-4567 or (212) 555-1234") ==
      "call <PHONE> or <PHONE>")
    assert(scrub("host 192.168.0.1:8080") == "host <IP>:8080")
    assert(scrub("you FuCk and bullshit!") == "you <TOX> and <TOX>!")
    assert(scrub("scunthorpe shitake classic") == "scunthorpe shitake classic")
  }

  test("ordering: SSN/CC shapes are not half-eaten by the phone pattern") {
    assert(scrub("123-45-6789") == "<SSN>")
    assert(scrub("4111 1111 1111 1111") == "<CC>")
  }

  test("idempotence: scrub(scrub(x)) == scrub(x)") {
    val samples = Seq(
      "a@b.co 10.0.0.1 555-123-4567 123-45-6789 plain text",
      "no pii here at all", "", "日本語テキスト with a@b.de")
    samples.foreach(s => assert(scrub(scrub(s)) == scrub(s)))
  }

  test("multi-byte UTF-8 and surrogate pairs survive untouched") {
    val s = "héllo wörld 日本語 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 🚀 emoji"
    assert(scrub(s) == s)
    val mixed = "𝔘𝔫𝔦 a@b.co 𝔠𝔬𝔡𝔢"
    assert(scrub(mixed) == "𝔘𝔫𝔦 <EMAIL> 𝔠𝔬𝔡𝔢")
  }

  test("null text scrubs to empty string (None=>'' contract)") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(Scrub.scrub(col("text"))).head().getString(0)
    assert(r == "")
  }
}

class HeuristicsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def m(text: Option[String], c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c(col("text"))).head().get(0)

  test("edge docs: empty / null / whitespace-only") {
    for (t <- Seq(Some(""), None, Some("   \t  "))) {
      assert(m(t, Heuristics.wordCount) == 0)
      assert(m(t, Heuristics.symbolWordRatio) == 0.0)
      assert(m(t, Heuristics.stopwordFraction) == 0.0)
      assert(m(t, Heuristics.wordRepetitionRatio) == 0.0)
      assert(m(t, Heuristics.dupLineFraction) == 0.0)
    }
    assert(m(Some(""), Heuristics.docLength) == 0)
    assert(m(None, Heuristics.docLength) == 0)
  }

  test("word and token counts") {
    assert(m(Some("the quick brown fox"), Heuristics.wordCount) == 4)
    assert(m(Some("ab 12 !x"), Heuristics.tokenCount) == 4) // ab|12|!|x
  }

  test("repetition and dup-line detection") {
    assert(m(Some("spam spam spam spam"), Heuristics.wordRepetitionRatio) == 0.75)
    assert(m(Some("line1\nline1\nline2"), Heuristics.dupLineFraction)
      .asInstanceOf[Double] > 0.3)
    assert(m(Some("a\nb\nc"), Heuristics.dupLineFraction) == 0.0)
  }

  test("stopword fraction is case-insensitive") {
    assert(m(Some("The cat AND dog"), Heuristics.stopwordFraction) == 0.5)
  }

  test("symbol-soup scores high symbol ratio") {
    val v = m(Some("@#$% ^&*( #$@!"), Heuristics.symbolWordRatio)
      .asInstanceOf[Double]
    assert(v > 2.0)
  }

  test("rolling hash: deterministic, order-sensitive") {
    val h1 = m(Some("abc"), Heuristics.rollingHash)
    val h2 = m(Some("abc"), Heuristics.rollingHash)
    val h3 = m(Some("acb"), Heuristics.rollingHash)
    assert(h1 == h2 && h1 != h3)
  }
}

class ModelSpec extends AnyFunSuite {
  test("langid classifies its own seed languages") {
    assert(LangId.predict("the cat and the dog were in the house with them")._1 == "en")
    assert(LangId.predict("la casa de los niños es muy grande y está entre calles")._1 == "es")
    assert(LangId.predict("le chat est dans la maison avec les enfants du quartier")._1 == "fr")
    assert(LangId.predict("der Hund und die Katze sind in dem Haus mit den Kindern")._1 == "de")
    assert(LangId.predict("我们的房子很大，他们在学校学习中文和数学")._1 == "zh")
    // round-3 depth languages (two extra scripts)
    assert(LangId.predict("la casa è molto grande e i bambini sono a scuola con gli altri")._1 == "it")
    assert(LangId.predict("não há nada melhor do que uma canção no coração durante a manhã")._1 == "pt")
    assert(LangId.predict("het huis is erg groot en de kinderen zijn op school met hun vrienden")._1 == "nl")
    assert(LangId.predict("наш дом очень большой и дети учатся в школе с друзьями")._1 == "ru")
    assert(LangId.predict("この家はとても大きくて子供たちは学校で勉強しています")._1 == "ja")
    // round-4 depth languages (one more script)
    assert(LangId.predict("nie wiem gdzie jest teraz ten dom ale może być bardzo dobrze")._1 == "pl")
    assert(LangId.predict("우리 가족 은 지금 학교 에서 한국 말 을 공부 하고 있습니다")._1 == "ko")
    // round-5 depth languages (two more scripts: Arabic, Devanagari)
    assert(LangId.predict("huset är mycket stort och barnen är i skolan med sina vänner")._1 == "sv")
    assert(LangId.predict("bu ev çok büyük ve çocuklar okulda arkadaşları ile birlikte")._1 == "tr")
    assert(LangId.predict("rumah ini sangat besar dan anak anak ada di sekolah dengan mereka")._1 == "id")
    assert(LangId.predict("ngôi nhà này rất lớn và trẻ con đang ở trường học với gia đình")._1 == "vi")
    assert(LangId.predict("هذا البيت كبير جدا والأطفال في المدرسة مع العائلة كل يوم")._1 == "ar")
    assert(LangId.predict("यह घर बहुत बड़ा है और बच्चे स्कूल में अपने परिवार के साथ हैं")._1 == "hi")
    assert(LangId.predict("บ้าน นี้ ใหญ่ มาก และ เด็ก อยู่ ที่ โรงเรียน กับ ครอบครัว")._1 == "th")
    // Thai at inference needs NO segmentation — the char-n-gram
    // featurizer reads the unsegmented form real Thai text has
    assert(LangId.predict("บ้านนี้ใหญ่มากและเด็กอยู่ที่โรงเรียนกับครอบครัว")._1 == "th")
  }

  test("langid invariant under whitespace padding; empty => und") {
    val base = LangId.predict("the quick brown fox jumps over the lazy dog")
    val padded = LangId.predict("   the quick brown fox jumps over the lazy dog   ")
    assert(base._1 == padded._1)
    assert(LangId.predict("")._1 == "und")
    assert(LangId.predict(null)._1 == "und")
  }

  test("perplexity: natural text lower than symbol soup; deterministic") {
    val nat = Perplexity.perplexity("the house is on the hill and the dog is in the garden")
    val soup = Perplexity.perplexity("qz@#xj!!vw$$kq%%zzj&&pqx")
    assert(nat < soup)
    assert(nat > 1.0 && nat < 100.0)
    assert(Perplexity.perplexity("abc") == Perplexity.perplexity("abc"))
    assert(Perplexity.perplexity("") == 1e9)
  }
}
