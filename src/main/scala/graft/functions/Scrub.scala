package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / toxicity scrubbing as a fixed, ordered regexp_replace chain.
  *
  * Pure Catalyst (codegen'd, no UDF). The byte-identical-output contract
  * (BASELINE.md "scrubbed text parity") hangs on two things frozen here:
  * (1) the exact patterns, (2) their application ORDER — longer/more
  * specific patterns run first so their matches can't be partially consumed
  * by shorter ones (e.g. credit cards before phones, SSNs before phones).
  * Patterns are kept in the RE2-compatible subset of Java regex so the
  * DuckDB oracle replays them exactly.
  *
  * Role analog in the reference: the verdict/scrub stage the `measure`
  * strings feed (weiser has no scrubber; this is the north-rule extension).
  */
object Scrub {

  /** (pattern, replacement) in application order. */
  val piiPatterns: Seq[(String, String)] = Seq(
    // email first: user@host could otherwise have its digits eaten
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // 16-digit card numbers (spaced/dashed groups of 4) before phones
    ("\\b(?:\\d{4}[ -]){3}\\d{4}\\b", "<CC>"),
    // SSN-shaped before generic phones
    ("\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    // US-style phone numbers; \b only before the digit alternative — a \b
    // before "(" can never match after a space (both sides non-word), and
    // RE2 (the oracle engine) has no lookbehind to express it otherwise
    ("(?:\\+?1[ .-])?(?:\\(\\d{3}\\)[ .-]?|\\b\\d{3}[ .-])\\d{3}[ .-]\\d{4}\\b", "<PHONE>"),
    // IPv4
    ("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
  )

  /** Toxicity lexicon: a short FROZEN subset of the public
    * "List of Dirty, Naughty, Obscene, and Otherwise Bad Words"
    * (LDNOOBW, CC-BY — the list C4/Common-Crawl-style pipelines use for
    * this exact purpose). Deliberately small and lowercase (the
    * case-insensitive substring guard below compares against lowercase
    * needles); changing it changes scrubbed bytes, so it is part of the
    * output contract like the PII patterns above.
    */
  val toxicityWords: Seq[String] = Seq(
    "fuck", "shit", "bitch", "cunt", "asshole", "bastard",
    "dickhead", "motherfucker", "bullshit", "jackass", "twat", "wanker")

  val toxicityPattern: String =
    "(?i)\\b(?:" + toxicityWords.mkString("|") + ")\\b"

  /** The full scrub chain over a text column. */
  def scrub(text: Column): Column = {
    val pii = piiPatterns.foldLeft(coalesce(text, lit(""))) {
      case (c, (pat, rep)) => regexp_replace(c, pat, rep)
    }
    regexp_replace(pii, toxicityPattern, "<TOX>")
  }

  /** Same chain as one UDF with precompiled Patterns: each Catalyst
    * regexp_replace round-trips UTF8String -> String -> UTF8String, so six
    * chained replaces cost six conversions per row; this costs one. Same
    * java.util.regex engine and Matcher.replaceAll semantics, so output
    * bytes are identical (ScrubSpec + the scrub_pii DuckDB oracle assert
    * it).
    */
  private lazy val compiled: Array[(java.util.regex.Pattern, String)] =
    (piiPatterns :+ (toxicityPattern, "<TOX>")).map { case (p, r) =>
      (java.util.regex.Pattern.compile(p), r)
    }.toArray

  /** Single-pass multi-needle guard: ONE scan over the text checking each
    * adjacent lowercase pair against the needles' two-char prefixes (a
    * 26x26 table), verifying the full needle only on a prefix hit. The
    * per-needle formulation was |lexicon| scans per document — the guard,
    * not the regexes, dominated scrub cost on clean text once the lexicon
    * grew past a handful of words. Still a pure necessary-condition test:
    * a prefix miss can only occur when no needle occurs.
    */
  private val prefixNeedles: Array[Array[String]] = {
    val t = new Array[Array[String]](26 * 26)
    toxicityWords.groupBy(w => (w.charAt(0) - 'a') * 26 + (w.charAt(1) - 'a'))
      .foreach { case (idx, ws) => t(idx) = ws.toArray }
    t
  }

  private def containsAnyNeedle(t: String): Boolean = {
    var i = 0
    val n = t.length
    while (i < n - 1) {
      val a = Character.toLowerCase(t.charAt(i))
      if (a >= 'a' && a <= 'z') {
        val b = Character.toLowerCase(t.charAt(i + 1))
        if (b >= 'a' && b <= 'z') {
          val ns = prefixNeedles((a - 'a') * 26 + (b - 'a'))
          if (ns != null) {
            var k = 0
            while (k < ns.length) {
              val w = ns(k)
              if (i + w.length <= n) {
                var j = 2
                while (j < w.length &&
                  Character.toLowerCase(t.charAt(i + j)) == w.charAt(j)) j += 1
                if (j == w.length) return true
              }
              k += 1
            }
          }
        }
      }
      i += 1
    }
    false
  }

  /** Necessary-condition guards per pattern: a pattern that cannot match
    * without '@' (email), a digit (cc/ssn/phone/ip) or a lexicon stem
    * (toxicity) is skipped after one cheap char scan. Exact — a guard
    * never suppresses a possible match — and it matters: the regex engine
    * was the pipeline's worst-scaling stage, and most documents carry no
    * PII at all.
    */
  def scrubString(text: String): String = {
    var t = if (text == null) "" else text
    var hasAt = false; var hasDigit = false
    var i = 0
    while (i < t.length && !(hasAt && hasDigit)) {
      val c = t.charAt(i)
      if (c == '@') hasAt = true
      else if (c >= '0' && c <= '9') hasDigit = true
      i += 1
    }
    if (hasAt) t = compiled(0)._1.matcher(t).replaceAll(compiled(0)._2)
    if (hasDigit) {
      var k = 1
      while (k < 5) { t = compiled(k)._1.matcher(t).replaceAll(compiled(k)._2); k += 1 }
    }
    if (containsAnyNeedle(t))
      t = compiled(5)._1.matcher(t).replaceAll(compiled(5)._2)
    t
  }

  val scrubUdf = udf { text: String => scrubString(text) }

  def scrubFast(text: Column): Column = scrubUdf(text)

  /** Count of PII matches scrubbed, for lineage metrics. */
  def piiMatchCount(text: Column): Column =
    piiPatterns.map { case (pat, _) =>
      size(regexp_extract_all(coalesce(text, lit("")), lit(pat), lit(0)))
    }.reduce(_ + _)
}
