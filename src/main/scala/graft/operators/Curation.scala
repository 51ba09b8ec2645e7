package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Heuristics

/** Corpus-curation operators that sit between filtering/dedup and the
  * final training mix: benchmark decontamination and deterministic
  * token-budget sampling. Like everything else in this engine they are
  * deterministic (hash-seeded, no RNG at run time) and shaped for the
  * 10^12-document case, not the fixture corpus:
  *
  *  - decontaminate: the eval/benchmark gram set is small by nature
  *    (eval suites are ~10^5-10^6 grams, the corpus is ~10^12 docs), so
  *    it is broadcast and the corpus side never shuffles its grams —
  *    the only shuffle is the per-doc overlap count over the MATCHED
  *    grams, which is tiny (most documents are clean).
  *  - sampleByTokenBudget: no per-stratum total order (a cumulative-sum
  *    window would sort each language on one task — the big-language
  *    skew killer). Instead: one aggregation for per-stratum token
  *    totals (broadcast back), then a stateless keep-if-hash-below-rate
  *    map, the same two-pass shape production samplers use.
  */
object Curation {

  /** Flag documents that share at least one word n-gram with a benchmark
    * set (train/test decontamination — the standard guard against eval
    * leakage in a pretraining corpus; see weiser's dataset-vs-dataset
    * check fan-out, /root/reference/weiser/checks/base.py, for the
    * reference's closest analogue: a declarative cross-dataset measure).
    *
    * Gram semantics are exactly [[Dedup.shingles]] (distinct word
    * n-grams; <n words collapse to the whole text) so the DuckDB oracle
    * reuses the pinned shingle twin. Output: one row per input document
    * with `overlap_count` (distinct doc grams present in the benchmark
    * gram set) and `contaminated` (overlap_count > 0).
    *
    * Scale: `benchmark` grams are deduplicated then broadcast — the
    * corpus side is a scan -> explode -> broadcast-hash semi-probe with
    * NO shuffle of document grams; only matched grams (rare) reach the
    * per-doc count shuffle, and the final join back to the corpus is a
    * left join on the key, partial-aggregated map-side. If a benchmark
    * ever outgrew the broadcast threshold the same plan minus the
    * explicit `broadcast()` hint degrades to a shuffled semi-join —
    * callers with a genuinely huge contamination reference should hash
    * grams to longs first (the gram strings never need to survive the
    * join).
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    keyCol: String, textCol: String,
                    n: Int = 3): DataFrame = {
    val benchGrams = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    val docGrams = docs
      .select(col(keyCol), explode(Dedup.shingles(col(textCol), n)).as("gram"))
    // shingles() already dedups grams per document, so count(*) after the
    // probe IS the distinct-overlap count — no count(distinct) shuffle.
    val overlaps = docGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("overlap_count"))
    docs.select(col(keyCol))
      .join(overlaps, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("overlap_count"), lit(0L)).as("overlap_count"),
        (coalesce(col("overlap_count"), lit(0L)) > 0).as("contaminated"))
  }

  /** Line-level boilerplate removal (CCNet-style): drop every line whose
    * EXACT text occurs in more than `maxDocFreq` distinct documents (nav
    * menus, cookie banners, copyright footers — the cross-document
    * repeated lines doc-level dedup cannot see), and reassemble each
    * document from its surviving lines in original order.
    *
    * Output: one row per input document — `clean_text` (surviving lines
    * joined by \n, '' if everything was boilerplate), `n_lines`,
    * `removed_lines`.
    *
    * Scale shape (three shuffles, none carrying what it doesn't need):
    *  1. doc-frequency pass shuffles (key, md5(line)) pairs — 16-byte
    *     fingerprints, never raw line text — distinct-per-doc then
    *     count; lines above the cap are a tiny set (bounded by
    *     total_lines / maxDocFreq) and BROADCAST,
    *  2. the corpus side is a scan -> explode -> broadcast ANTI probe
    *     (no shuffle),
    *  3. reassembly groups surviving (pos, line) by key — the one
    *     unavoidable text-carrying shuffle; a mapPartitions rebuild
    *     against the broadcast heavy-set would avoid it at the cost of
    *     leaving the declarative plan (AQE, codegen), which is the wrong
    *     trade while the shuffle is one pass over kept text.
    * Within-document duplicate lines count ONCE toward doc frequency
    * (distinct per doc) but are all removed if the line is heavy.
    */
  def dedupLines(docs: DataFrame, keyCol: String, textCol: String,
                 maxDocFreq: Long): DataFrame = {
    val withLines = docs.select(col(keyCol),
      split(coalesce(col(textCol), lit("")), "\n").as("ls"))
    val lines = withLines.select(col(keyCol),
      posexplode(col("ls")).as(Seq("pos", "line")))
    val heavy = lines.select(col(keyCol), md5(col("line")).as("lh"))
      .distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") > maxDocFreq)
      .select(col("lh"))
    val kept = lines.join(broadcast(heavy),
      md5(col("line")) === col("lh"), "left_anti")
    val rebuilt = kept.groupBy(col(keyCol)).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x("line")), "\n").as("clean_text"),
      count(lit(1)).as("kept_lines"))
    withLines.select(col(keyCol), size(col("ls")).cast(LongType).as("n_lines"))
      .join(rebuilt, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("kept_lines"), lit(0L)))
          .as("removed_lines"))
  }

  /** URL-level curation — the filter stage that runs BEFORE any text is
    * parsed (the cheapest drop is the one that never decodes the page):
    *
    *  1. `blocked_host`: host (lower-cased authority of the url) equals a
    *     blocklist entry or is a subdomain of one (`endsWith "." + entry`
    *     — a UT1-style domain blocklist blocks whole registered domains),
    *  2. `banned_url_pattern`: the url contains a banned substring,
    *     case-insensitive (tracker paths, session ids, spam keywords),
    *  3. `host_cap`: at most ~`maxDocsPerHost` documents per host, decided
    *     by deterministic hash-thresholding — keep iff the first 32 md5
    *     bits of the url, as a fraction of 2^32, fall below
    *     min(1, cap / eligible_host_docs) — NOT a per-host top-K window
    *     (which would total-order a 10^9-page host on one task). Same
    *     bit-deterministic rate trick as [[sampleByTokenBudget]].
    *
    * Reasons are mutually exclusive with that precedence; `keep` is
    * `reason == ""`. Output is a URL-VERDICT table (url, host,
    * n_host_docs, keep, reason) — callers semi-join the corpus by url, so
    * page text/html never enters this operator's shuffles.
    *
    * Scale shape: rule marking is a stateless scan -> project (the two
    * rule lists compile to codegen'd boolean chains, no joins); the
    * per-host count is one partial-aggregated shuffle of (host) pairs;
    * the join back is keyed by host — O(#hosts) on the build side
    * (~10^8 at crawl scale: a shuffle join, AQE-splittable when a hot
    * host skews it, broadcast automatically at fixture scale).
    */
  def urlFilter(pages: DataFrame, urlCol: String,
                blockedHosts: Seq[String], bannedUrlParts: Seq[String],
                maxDocsPerHost: Long): DataFrame = {
    val marked = pages.select(col(urlCol).as("url"),
      hostOf(urlCol).as("host"),
      blockedExpr(urlCol, blockedHosts).as("blocked"),
      bannedExpr(urlCol, bannedUrlParts).as("banned"))
    val counts = marked.filter(!col("blocked") && !col("banned"))
      .groupBy(col("host")).agg(count(lit(1)).as("n_host_docs"))
    // non-blocked rows always find their own host in `counts`, so the
    // null-count case can only reach the earlier reason branches
    val capKeep = (hash32Of("url").cast(DoubleType) / lit(4294967296.0)) <
      least(lit(1.0), lit(maxDocsPerHost.toDouble) /
        col("n_host_docs").cast(DoubleType))
    val reason = when(col("blocked"), "blocked_host")
      .when(col("banned"), "banned_url_pattern")
      .when(!capKeep, "host_cap")
      .otherwise("")
    marked.join(counts, Seq("host"), "left")
      .select(col("url"), col("host"),
        coalesce(col("n_host_docs"), lit(0L)).as("n_host_docs"),
        (reason === "").as("keep"), reason.as("reason"))
  }

  /** The [[urlFilter]] decision applied directly to a pages frame,
    * preserving its columns — the shape the end-to-end pipeline's stage 0
    * wants (rows that pass every url rule; the cheapest drop never parses
    * the page). Decision semantics are identical to urlFilter
    * (spec-pinned keep-set equality); the PLAN differs where scale
    * demands it: blocked/banned are stateless codegen'd filters, and the
    * host cap joins the page side against the BROADCAST set of OVER-CAP
    * hosts only — bounded by total_docs/cap (10^7 entries for a 10^12-doc
    * crawl capped at 10^5) vs O(#hosts) for the full count table — so the
    * page payload itself never shuffles. Hosts absent from the over-cap
    * set keep all their documents, exactly as urlFilter's
    * min(1, cap/n) rate evaluates to 1 there.
    */
  def applyUrlRules(pages: DataFrame, urlCol: String,
                    blockedHosts: Seq[String], bannedUrlParts: Seq[String],
                    maxDocsPerHost: Long = Long.MaxValue): DataFrame = {
    val eligible = pages.filter(!blockedExpr(urlCol, blockedHosts) &&
      !bannedExpr(urlCol, bannedUrlParts))
    if (maxDocsPerHost == Long.MaxValue) eligible
    else {
      val overCap = eligible.select(hostOf(urlCol).as("__host"))
        .groupBy(col("__host")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxDocsPerHost)
      eligible.join(broadcast(overCap),
          hostOf(urlCol) === col("__host"), "left")
        .filter(col("__n").isNull ||
          (hash32Of(urlCol).cast(DoubleType) / lit(4294967296.0)) <
            lit(maxDocsPerHost.toDouble) / col("__n").cast(DoubleType))
        .drop("__host", "__n")
    }
  }

  /** Deterministic sequence packing (GPT-style concat-and-chunk
    * bookkeeping): documents are hash-assigned to `buckets` independent
    * packing streams, concatenated within their stream in a deterministic
    * order (by md5 of the key — reruns, resumes and the DuckDB oracle
    * agree), and chunked into fixed `seqLen`-token training sequences.
    * Emits, per document: its stream (`bucket`), `token_count`
    * ([[graft.functions.Heuristics.wordCount]] twin), `start_offset` in
    * the stream's concatenated token tape, the training-sequence index
    * its first token lands in (`seq_index`), and whether it straddles a
    * sequence boundary (`spans_boundary` — the tail that a loader either
    * wraps into the next sequence or truncates).
    *
    * Scale shape: ONE shuffle — hash-partition by bucket, sort by the
    * md5 key within each bucket (a cumulative-sum window). Packing is
    * inherently order-dependent, so the trick is to make the unit of
    * order a BUCKET, not the corpus: buckets are md5-uniform (no skew),
    * each holds ~1/`buckets` of the tokens, and a 10^12-doc corpus with
    * buckets sized to the cluster (e.g. 100k) sorts ~10^7 docs per task
    * instead of one global 10^12-doc total order. Offsets are exact
    * longs; seq_index uses a double floor-divide, exact while per-bucket
    * token totals stay below 2^53 (a 100 TB corpus is ~10^13 tokens —
    * pick buckets >= ~10 and the bound holds with 9 digits to spare).
    */
  def packSequences(docs: DataFrame, keyCol: String, textCol: String,
                    seqLen: Long, buckets: Int): DataFrame = {
    require(seqLen > 0 && buckets > 0)
    val h = md5(col(keyCol).cast(StringType).cast(BinaryType))
    val base = docs.select(col(keyCol),
      Heuristics.wordCount(col(textCol)).cast(LongType).as("token_count"),
      h.as("__h"),
      pmod(conv(substring(h, 1, 15), 16, 10).cast(LongType),
        lit(buckets.toLong)).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("__h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = sum(col("token_count")).over(w)
    val start = (cum - col("token_count")).as("start_offset")
    val seqIdx = floor((cum - col("token_count")).cast(DoubleType) /
      lit(seqLen.toDouble)).cast(LongType)
    val endIdx = floor((cum - lit(1L)).cast(DoubleType) /
      lit(seqLen.toDouble)).cast(LongType)
    base.select(col(keyCol), col("bucket"), col("token_count"),
      start, seqIdx.as("seq_index"),
      (col("token_count") > 0 && endIdx =!= seqIdx).as("spans_boundary"))
  }

  /** Lower-cased authority component of the url. */
  /** Parameter names stripped by [[normalizeUrl]] (name-anchored regex:
    * `utm_*` prefix plus the common click identifiers). Frozen so the
    * DuckDB oracle and the Spark expression share one alternation.
    */
  private[operators] val trackingParamPattern: String =
    "^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"

  /** URL canonicalization — the step before any URL-keyed dedup or host
    * accounting, so byte-different spellings of one page collapse:
    *
    *  1. scheme and authority lowercase; default port stripped
    *     (`:80` for http, `:443` for https);
    *  2. fragment dropped;
    *  3. tracking params removed ([[trackingParamPattern]]), surviving
    *     params sorted byte-wise and rejoined (the '?' disappears when
    *     none survive);
    *  4. an empty path becomes '/' (so `https://a.com` ==
    *     `https://a.com/`).
    *
    * Paths and parameter VALUES are left byte-identical — %-decoding or
    * case-folding there changes which resource is named. Inputs without
    * a `scheme://` prefix (and NULLs) pass through untouched: curation
    * must never invent structure. Pure Catalyst expressions (regexes +
    * array ops — codegen-friendly, no UDF), and every rule is
    * re-derivable in SQL, so the gate oracle runs the identical
    * normalization.
    */
  def normalizeUrl(url: Column): Column = {
    val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val rest = regexp_replace(url, schemeRe, "")
    val auth0 = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val afterAuth = regexp_replace(rest, "^[^/?#]*", "")
    val noFrag = regexp_replace(afterAuth, "#.*$", "")
    val path = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParamPattern))
    val sortedQ = array_join(array_sort(params), "&")
    val pathNorm = when(path === "", lit("/")).otherwise(path)
    val rebuilt = concat(scheme, lit("://"), auth, pathNorm,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
    when(url.isNull || !url.rlike(schemeRe), url).otherwise(rebuilt)
  }

  private def hostOf(urlCol: String): Column =
    lower(regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))

  private def blockedExpr(urlCol: String, blockedHosts: Seq[String]): Column =
    blockedHosts.map(_.toLowerCase).map(b =>
        hostOf(urlCol) === b || hostOf(urlCol).endsWith("." + b))
      .reduceOption(_ || _).getOrElse(lit(false))

  private def bannedExpr(urlCol: String, bannedUrlParts: Seq[String]): Column =
    bannedUrlParts.map(_.toLowerCase).map(p =>
        lower(col(urlCol)).contains(p))
      .reduceOption(_ || _).getOrElse(lit(false))

  /** First 32 md5 bits of the url as a long — the shared threshold hash. */
  private def hash32Of(urlCol: String): Column =
    conv(substring(md5(col(urlCol)), 1, 8), 16, 10).cast(LongType)

  /** Deterministic stratified sampling to a per-stratum token budget.
    *
    * Every stratum (e.g. language) gets `keep rate = min(1, budget /
    * stratum_token_total)`; a document is kept iff the first 32 bits of
    * md5(key) — as a fraction of 2^32 — fall below its stratum's rate.
    * Expected kept tokens per stratum ≈ budget, and membership is a pure
    * function of (key, stratum totals), so reruns, resumes and the
    * DuckDB oracle all agree bit-for-bit: hash32/2^32 is exact in a
    * double (numerator < 2^32, power-of-two denominator) and
    * budget/total is the same IEEE division of the same integers on
    * both engines.
    *
    * Token counts use the engine's word counter ([[Heuristics.wordCount]],
    * native codegen'd, \s+-split semantics shared with the docWords
    * oracle twin).
    *
    * Scale: ONE aggregation produces the per-stratum totals (strata
    * number in the dozens — broadcast back), then a stateless
    * scan -> project decides membership. No window function, no
    * per-stratum total order, so a stratum with 90% of the corpus costs
    * nothing extra (contrast: a cumulative-sum-until-budget sampler
    * sorts that stratum on one task). The two passes over the input are
    * the irreducible minimum for an exact-total rate.
    */
  def sampleByTokenBudget(docs: DataFrame, keyCol: String,
                          textCol: String, stratumCol: String,
                          budgetTokens: Long): DataFrame = {
    val withTokens = docs.select(
      col(keyCol),
      coalesce(col(stratumCol), lit("")).as("stratum"),
      Heuristics.wordCount(col(textCol)).cast(LongType).as("token_count"))
    val totals = withTokens.groupBy(col("stratum"))
      .agg(sum(col("token_count")).as("stratum_tokens"))
    val hash32 = conv(
      substring(md5(col(keyCol).cast(StringType).cast(BinaryType)), 1, 8),
      16, 10).cast(LongType)
    withTokens
      .join(broadcast(totals), Seq("stratum"))
      .select(col(keyCol), col("stratum"), col("token_count"),
        ((hash32.cast(DoubleType) / lit(4294967296.0)) <
          least(lit(1.0),
            lit(budgetTokens.toDouble) /
              col("stratum_tokens").cast(DoubleType))).as("sampled"))
  }
}
