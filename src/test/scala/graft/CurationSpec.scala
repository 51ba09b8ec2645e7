package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- decontaminate ----

  private lazy val corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),     // benchmark member
    (1L, "alpha beta gamma delta epsilon zeta"),     // exact copy -> all grams
    (2L, "intro words then alpha beta gamma closing"), // one shared gram
    (3L, "totally unrelated text about spark plans and codegen stages"),
    (4L, "tiny doc"),                                // <3 words: whole-text gram
    (5L, "tiny doc")                                 // copies the whole-text gram
  ).toDF("doc_id", "text")

  test("decontaminate flags gram overlap with the benchmark slice") {
    val bench = corpus.filter(col("doc_id") === 0 || col("doc_id") === 4)
    val r = Curation.decontaminate(corpus, bench, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2)))
      .toMap
    // doc 0/1: 4 grams of a 6-word text, all in the bench set
    assert(r(0L) == (4L, true))
    assert(r(1L) == (4L, true))
    // doc 2: shares exactly "alpha beta gamma"
    assert(r(2L) == (1L, true))
    assert(r(3L) == (0L, false))
    // whole-text shingle of a <3-word doc matches its copy in the bench
    assert(r(4L) == (1L, true))
    assert(r(5L) == (1L, true))
  }

  test("decontaminate emits one row per input document") {
    val bench = corpus.filter(col("doc_id") === 0)
    assert(Curation.decontaminate(corpus, bench, "doc_id", "text")
      .count() == corpus.count())
  }

  // ---- dedupLines ----

  test("dedupLines strips cross-document heavy lines, keeps order") {
    val docs = (0L until 8L).map { i =>
      (i, s"HEADER\nbody unique $i\nmid $i\nFOOTER")
    } :+ ((8L, "HEADER\nHEADER\nonly header doc")) :+
      ((9L, "no boilerplate here"))
    val df = docs.toDF("doc_id", "text")
    val r = Curation.dedupLines(df, "doc_id", "text", maxDocFreq = 5L)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    // HEADER in 9 docs, FOOTER in 8 -> both heavy (cap 5)
    assert(r(0L) == ("body unique 0\nmid 0", 4L, 2L))
    assert(r(7L) == ("body unique 7\nmid 7", 4L, 2L))
    // within-doc duplicates: counted once for df, both occurrences removed
    assert(r(8L) == ("only header doc", 3L, 2L))
    assert(r(9L) == ("no boilerplate here", 1L, 0L))
  }

  test("dedupLines: all-boilerplate doc yields empty text, not a dropped row") {
    val docs = ((0L until 7L).map(i => (i, "SAME")) :+ ((7L, "SAME\nSAME")))
      .toDF("doc_id", "text")
    val r = Curation.dedupLines(docs, "doc_id", "text", maxDocFreq = 3L)
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getLong(3)))
      .toMap
    assert(r.size == 8)
    assert(r(0L) == ("", 1L))
    assert(r(7L) == ("", 2L))
  }

  // ---- urlFilter ----

  test("normalizeUrl: case/ports/tracking/fragment rules, byte-exact " +
    "passthrough for non-URLs and non-default ports") {
    val rows = Seq(
      // stripping is name-case-sensitive (utm_ convention is lowercase);
      // surviving params sort byte-wise, so 'UTM_source' < 'k'
      "HTTP://A.com:80/x?UTM_source=1&k=2&utm_x=3#f",
      "https://a.com:8443/x",  // non-default port: kept
      "ftp://Host:21/X",       // non-http(s): host lowered, port untouched
      "mailto:someone@x.y",    // no '://': byte-exact passthrough
      "https://b.org?ref=abc", // empty path -> '/', all params stripped
      null
    ).toDF("u").select(col("u"),
      Curation.normalizeUrl(col("u")).as("n"))
    val got = rows.collect().map(r =>
      Option(r.getString(0)).orNull -> Option(r.getString(1)).orNull).toMap
    assert(got("HTTP://A.com:80/x?UTM_source=1&k=2&utm_x=3#f") ==
      "http://a.com/x?UTM_source=1&k=2")
    assert(got("https://a.com:8443/x") == "https://a.com:8443/x")
    assert(got("ftp://Host:21/X") == "ftp://host:21/X")
    assert(got("mailto:someone@x.y") == "mailto:someone@x.y")
    assert(got("https://b.org?ref=abc") == "https://b.org/")
    assert(got(null) == null)
  }

  test("urlFilter: blocklist covers subdomains, reasons take precedence") {
    val pages = Seq(
      "https://spam.example.com/a",          // exact blocklist hit
      "https://shop.spam.example.com/b",     // subdomain of a blocked host
      "https://notspam.example.com/c",       // NOT a subdomain (no dot boundary)
      "https://ok.example.com/casino/jackpot", // banned pattern
      "https://spam.example.com/casino",     // blocked AND banned -> blocked wins
      "https://ok.example.com/fine"
    ).toDF("url")
    val r = Curation.urlFilter(pages, "url",
        blockedHosts = Seq("spam.example.com"),
        bannedUrlParts = Seq("CASINO"), maxDocsPerHost = 100L)
      .collect().map(x => x.getString(0) -> (x.getBoolean(3), x.getString(4)))
      .toMap
    assert(r("https://spam.example.com/a") == (false, "blocked_host"))
    assert(r("https://shop.spam.example.com/b") == (false, "blocked_host"))
    assert(r("https://notspam.example.com/c") == (true, ""))
    assert(r("https://ok.example.com/casino/jackpot") ==
      (false, "banned_url_pattern"))
    assert(r("https://spam.example.com/casino") == (false, "blocked_host"))
    assert(r("https://ok.example.com/fine") == (true, ""))
  }

  test("urlFilter: host cap is deterministic, rate-accurate, count-aware") {
    val pages = ((0 until 400).map(i => s"https://big.example.com/doc/$i") ++
      (0 until 5).map(i => s"https://small.example.com/doc/$i")).toDF("url")
    val run1 = Curation.urlFilter(pages, "url", Nil, Nil, 100L)
    val kept1 = run1.filter(col("keep")).collect()
      .map(_.getString(0)).toSet
    // the small host is under the cap: everything kept, n_host_docs exact
    assert((0 until 5).forall(i => kept1(s"https://small.example.com/doc/$i")))
    assert(run1.filter(col("host") === "big.example.com")
      .select(max(col("n_host_docs"))).head.getLong(0) == 400L)
    // hash-threshold keep rate 0.25 on 400 docs: binomial, |kept-100|
    // within 5 sigma of the exact-rate expectation
    val bigKept = kept1.count(_.contains("big."))
    assert(math.abs(bigKept - 100) < 45, s"bigKept=$bigKept")
    // bit-deterministic across runs
    val kept2 = Curation.urlFilter(pages, "url", Nil, Nil, 100L)
      .filter(col("keep")).collect().map(_.getString(0)).toSet
    assert(kept1 == kept2)
    // dropped-by-cap rows carry the reason
    assert(run1.filter(!col("keep")).select(col("reason")).distinct()
      .collect().map(_.getString(0)).toSeq == Seq("host_cap"))
  }

  test("applyUrlRules: keep-set identical to urlFilter, page columns " +
    "preserved") {
    val pages = ((0 until 300).map(i =>
      (s"https://big.example.com/doc/$i", i)) ++
      (0 until 5).map(i => (s"https://small.example.com/doc/$i", i)) ++
      Seq(("https://spam.example.com/x", 999),
        ("https://ok.example.com/casino", 998))).toDF("url", "payload")
    val verdictKeeps = Curation.urlFilter(pages, "url",
        Seq("spam.example.com"), Seq("casino"), 80L)
      .filter(col("keep")).select(col("url"))
      .collect().map(_.getString(0)).toSet
    val applied = Curation.applyUrlRules(pages, "url",
      Seq("spam.example.com"), Seq("casino"), 80L)
    assert(applied.columns.toSeq == Seq("url", "payload"))
    assert(applied.collect().map(_.getString(0)).toSet == verdictKeeps)
    // under-cap fast path: no cap -> stateless filters only
    assert(Curation.applyUrlRules(pages, "url", Nil, Nil).count() ==
      pages.count())
  }

  // ---- packSequences ----

  test("packSequences: per-bucket tapes are gapless, chunk math exact, " +
    "deterministic") {
    val docs = (0L until 120L).map(i =>
      (i, (0 until (i % 7).toInt + 1).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Curation.packSequences(docs, "doc_id", "text",
      seqLen = 10L, buckets = 3)
    val rows = r.collect().map(x => (x.getLong(0), x.getLong(1),
      x.getLong(2), x.getLong(3), x.getLong(4), x.getBoolean(5)))
    assert(rows.length == 120)
    // every bucket's tape starts at 0 and is gapless: sorted by offset,
    // each doc starts where the previous ended
    rows.groupBy(_._2).foreach { case (b, ds) =>
      val sorted = ds.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"bucket $b starts at ${sorted.head._4}")
      sorted.sliding(2).foreach {
        case Array((_, _, tc, st, _, _), (_, _, _, st2, _, _)) =>
          assert(st2 == st + tc, s"gap in bucket $b at $st2")
        case _ =>
      }
    }
    // chunk bookkeeping: seq_index = floor(start/10), spans_boundary iff
    // the doc's tokens cross a multiple of 10
    rows.foreach { case (id, _, tc, st, si, sp) =>
      assert(si == st / 10L, s"doc $id seq_index")
      assert(sp == (tc > 0 && (st + tc - 1) / 10L != st / 10L),
        s"doc $id spans_boundary")
    }
    // deterministic rerun
    val again = Curation.packSequences(docs, "doc_id", "text", 10L, 3)
      .collect().map(x => (x.getLong(0), x.getLong(3))).toMap
    assert(rows.forall(t => again(t._1) == t._4))
  }

  // ---- sampleByTokenBudget ----

  private lazy val stratified = (0L until 200L).map { i =>
    val lang = if (i % 4 == 0) "de" else "en" // en is the heavy stratum
    (i, Seq.fill(10)("w" + i).mkString(" "), lang) // 10 tokens per doc
  }.toDF("doc_id", "text", "lang")

  test("sampler is deterministic and stratified") {
    val a = Curation.sampleByTokenBudget(stratified, "doc_id", "text",
      "lang", 500L).collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getBoolean(3))).toMap
    val b = Curation.sampleByTokenBudget(stratified, "doc_id", "text",
      "lang", 500L).collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(a == b)
    assert(a.values.forall(_._2 == 10L)) // token twin: 10 words per doc
    // expected kept tokens per stratum ~= budget: en has 1500 tokens at
    // rate 1/3, de 500 at rate 1 (budget >= total -> keep all)
    val deKept = a.collect { case (_, ("de", _, s)) => s }
    assert(deKept.forall(identity)) // rate clamps at 1.0
    val enKeptTokens = a.collect { case (_, ("en", n, true)) => n }.sum
    assert(enKeptTokens > 200L && enKeptTokens < 900L) // ~500 expected
  }

  test("raising the budget never un-samples a document") {
    val lo = Curation.sampleByTokenBudget(stratified, "doc_id", "text",
      "lang", 300L).filter(col("sampled")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val hi = Curation.sampleByTokenBudget(stratified, "doc_id", "text",
      "lang", 900L).filter(col("sampled")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi)) // hash threshold is monotone in the rate
  }
}
