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

  /** Toxicity lexicon (placeholder list; the mechanism, a word-boundary
    * replace, is the deliverable). Case-insensitive via (?i).
    */
  val toxicityWords: Seq[String] = Seq("badword1", "badword2", "slur1")

  val toxicityPattern: String =
    "(?i)\\b(?:" + toxicityWords.mkString("|") + ")\\b"

  /** The full scrub chain over a text column. */
  def scrub(text: Column): Column = {
    val pii = piiPatterns.foldLeft(coalesce(text, lit(""))) {
      case (c, (pat, rep)) => regexp_replace(c, pat, rep)
    }
    regexp_replace(pii, toxicityPattern, "<TOX>")
  }

  /** Count of PII matches scrubbed, for lineage metrics. */
  def piiMatchCount(text: Column): Column =
    piiPatterns.map { case (pat, _) =>
      size(regexp_extract_all(coalesce(text, lit("")), lit(pat), lit(0)))
    }.reduce(_ + _)
}
