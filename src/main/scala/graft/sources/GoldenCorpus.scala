package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic golden fixture corpus (FIXTURES.md §1 `small` tier).
  *
  * Every document is a pure function of its index (per-doc seeded PRNG, no
  * global RNG state), so the corpus is identical across JVMs, partitionings
  * and runs — the precondition for the committed golden labels the F1 gate
  * compares against (BASELINE.md: keep/drop F1 >= 0.99, byte-identical
  * scrubbed text per url).
  *
  * Document classes (cycled by index):
  *  - clean prose in each of the 5 seed languages, varying length
  *  - too-short docs                       (min_doc_length)
  *  - symbol soup                          (max_symbol_word_ratio)
  *  - keyword-stuffing spam                (max_word_repetition)
  *  - duplicated-line boilerplate          (max_dup_line_fraction)
  *  - empty / whitespace-only
  *  - PII-laced prose (emails/phones/IPs/SSNs/CCs) for scrub byte-identity
  *  - multi-byte UTF-8 + surrogate-pair content
  */
object GoldenCorpus {

  private val langs = Array("en", "es", "fr", "de", "zh")

  private def words(lang: String): Array[String] =
    if (lang == "zh")
      // zh seed is partly unsegmented: the fixture inventory is its single
      // characters (space-delimited zh text, segmented-corpus shape)
      graft.functions.LangId.seeds("zh").replaceAll("\\s", "")
        .toCharArray.map(_.toString).distinct
    else
      graft.functions.LangId.seeds(lang).split("\\s+").filter(_.nonEmpty)

  /** One document, deterministically, from its index. Indexes >= 240 are
    * the round-2 web-junk classes (boilerplate nav menus, code blocks) —
    * appended past the original range so the original 240 docs and their
    * committed labels are byte-stable across rounds.
    */
  def doc(i: Int): (String, String, String) = {
    val rnd = new scala.util.Random(i.toLong * 7919 + 42)
    val lang = langs(i % langs.length)
    val ws = words(lang)
    def sentence(n: Int): String =
      (0 until n).map(_ => ws(rnd.nextInt(ws.length))).mkString(" ")
    val cls = if (i >= 240) 12 + (i % 2) else i % 12
    val text = cls match {
      case 12 => // boilerplate nav menu: duplicated link rows, no prose
        val items = Array("Home", "About", "Products", "Services", "Blog",
          "Careers", "Contact", "Login", "Register", "Privacy", "Terms")
        val menu = (0 until 6 + rnd.nextInt(5))
          .map(_ => items(rnd.nextInt(items.length))).mkString(" | ")
        (Seq.fill(4 + rnd.nextInt(3))(menu) :+
          "Copyright 2024 Example Corp All rights reserved").mkString("\n")
      case 13 => // code block: symbol-heavy, stopword-free
        val ids = Array("val", "def", "return", "if", "else", "for",
          "while", "int", "string", "foo", "bar", "baz", "qux", "result",
          "index", "count")
        (0 until 10 + rnd.nextInt(8)).map { k =>
          s"${ids(rnd.nextInt(ids.length))} ${ids(rnd.nextInt(ids.length))}$k" +
            s" = ${ids(rnd.nextInt(ids.length))}(${rnd.nextInt(100)}," +
            s" \"${ids(rnd.nextInt(ids.length))}\");"
        }.mkString("\n")
      case 9 => // too short
        sentence(3 + rnd.nextInt(5))
      case 10 => // symbol soup
        (0 until 40).map(_ => "@#$%^&*" (rnd.nextInt(7)).toString * (1 + rnd.nextInt(3)))
          .mkString(" ")
      case 11 if i % 24 == 11 => // empty / whitespace
        if (rnd.nextBoolean()) "" else "   \t  "
      case 11 => // keyword stuffing
        (ws(rnd.nextInt(ws.length)) + " ") * (60 + rnd.nextInt(40))
      case 8 => // duplicated lines
        val line = sentence(10)
        (Seq.fill(6)(line) ++ Seq(sentence(8))).mkString("\n")
      case 7 => // PII-laced prose
        sentence(60) +
          s" contact user$i@example.org or +1 555-12${i % 10}-4567," +
          s" ssn 123-45-678${i % 10}, card 4111 1111 1111 111${i % 10}," +
          s" server 10.0.${i % 256}.7 " + sentence(60)
      case 6 => // multi-byte + surrogate pairs
        sentence(50) + " 日本語テキスト 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 🚀 " + sentence(50)
      case _ => // clean prose, varying length
        sentence(40 + rnd.nextInt(300))
    }
    (s"https://fixture.example.com/doc/$i", text, lang)
  }

  def generate(spark: SparkSession, n: Int = 280): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.createDataset((0 until n).map(doc))
      .toDF("url", "text", "lang")
      .select(col("url"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("warc_ts"),
        encode(concat(lit("<html>"), col("text"), lit("</html>")), "UTF-8")
          .as("html"),
        col("text"), col("lang"))
  }
}
