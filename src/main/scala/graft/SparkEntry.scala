package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans._
import graft.functions.{Heuristics, Scrub}
import graft.operators.{Curation, Dedup, Multimodal, QualityFilter, Similarity}
import graft.sources.Pages
import graft.streaming.EventStream

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with a DuckDB-equivalent oracle where the operator is
  * SQL-expressible. Column names are aligned between both sides.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Heavy per-row operators read the testdata single-file parquet as ONE
    * input split — repartition so the compute spreads across all cores
    * (row content and therefore oracle comparison are unaffected).
    */
  private def tp(s: SparkSession, dir: String, name: String): DataFrame =
    t(s, dir, name).repartition(s.sparkContext.defaultParallelism)

  private def pagesP(s: SparkSession, dir: String): DataFrame =
    Pages.fromDocuments(tp(s, dir, "documents"))

  private val runId = "r1"
  private val runTime = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")

  /** Metric-row subset stable across engines (drops lit-only columns). */
  private def metricCols(df: DataFrame, round4: Boolean = false): DataFrame = {
    val v = if (round4) round(col("actual_value"), 4) else col("actual_value")
    df.select(col("name"), col("check_id"), v.as("actual_value"),
      col("success"), col("fail"))
  }

  private def check(name: String, dataset: String, ct: CheckType,
                    measure: Option[String] = None,
                    condition: Condition = Condition.Gt,
                    threshold: Either[Double, (Double, Double)] = Left(0.0),
                    dims: Seq[String] = Nil, filter: Option[String] = None,
                    td: Option[TimeDimension] = None): Check =
    Check(name, Seq(dataset), ct, measure, condition, threshold, dims, filter, td)

  private def runCheck(s: SparkSession, dir: String, c: Check,
                       tabs: Seq[String]): DataFrame = {
    val tables = tabs.map(n => n -> t(s, dir, n)).toMap
    tables.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    CheckCompiler.run(c, s, tables, "default", runId, runTime)
  }

  /** Flagship: full quality-filter pipeline (heuristics + langid +
    * perplexity + scrub + verdict) over the pages table at sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    QualityFilter.run(Pages.load(spark, "/root/testdata/sf0.001"))
      .select("url", "lang", "lang_pred", "langid_score", "ppl",
        "quality_score", "keep", "fail_reasons", "scrubbed_text")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- check framework: aggregation checks (SURVEY §2.4, §2.9) ----
    "q_check_row_count" -> ((s, dir) => metricCols(
      runCheck(s, dir, check("row_count_lineitem", "lineitem",
        CheckType.RowCount, condition = Condition.Gt, threshold = Left(1000),
        filter = Some("l_returnflag = 'R'")), Seq("lineitem")))),

    "q_check_row_count_dims" -> ((s, dir) => metricCols(
      runCheck(s, dir, check("orders_by_priority", "orders",
        CheckType.RowCount, condition = Condition.Gt, threshold = Left(10),
        dims = Seq("o_orderpriority")), Seq("orders")))),

    "q_check_sum_time" -> ((s, dir) => metricCols(
      runCheck(s, dir, check("sum_qty", "lineitem", CheckType.Sum,
        measure = Some("l_quantity"), condition = Condition.Gt,
        threshold = Left(100),
        dims = Seq("l_returnflag"),
        td = Some(TimeDimension("l_shipdate", "month"))), Seq("lineitem")))),

    "q_check_min" -> ((s, dir) => metricCols(
      runCheck(s, dir, check("min_price", "orders", CheckType.Min,
        measure = Some("o_totalprice"), condition = Condition.Ge,
        threshold = Left(0), dims = Seq("o_orderpriority")), Seq("orders")),
      round4 = true)),

    "q_check_max" -> ((s, dir) => metricCols(
      runCheck(s, dir, check("max_price", "orders", CheckType.Max,
        measure = Some("o_totalprice"), condition = Condition.Le,
        threshold = Left(1000000), dims = Seq("o_orderstatus")), Seq("orders")),
      round4 = true)),

    "q_check_numeric_between" -> ((s, dir) => metricCols(
      runCheck(s, dir, check("avg_price_band", "orders", CheckType.Numeric,
        measure = Some("avg(o_totalprice)"), condition = Condition.Between,
        threshold = Right((1000.0, 500000.0))), Seq("orders")), round4 = true)),

    // inline-SQL dataset (SURVEY §2.1 S2) + not_empty per-dimension
    "q_check_not_empty" -> ((s, dir) => metricCols(
      runCheck(s, dir, check("evt_not_empty",
        "SELECT nullif(event_type, 'click') AS et2, value FROM events",
        CheckType.NotEmpty, condition = Condition.Le, threshold = Left(0),
        dims = Seq("et2", "value")), Seq("events")))),

    "q_check_not_empty_pct" -> ((s, dir) => metricCols(
      runCheck(s, dir, check("evt_not_empty_pct",
        "SELECT nullif(event_type, 'click') AS et2, value FROM events",
        CheckType.NotEmptyPct, condition = Condition.Le, threshold = Left(0.5),
        dims = Seq("et2", "value")), Seq("events")), round4 = true)),

    // multi-dataset fan-out (SURVEY §2.1 S3)
    "q_check_multi_dataset" -> ((s, dir) => metricCols(
      runCheck(s, dir, Check("rc_multi", Seq("orders", "lineitem"),
        CheckType.RowCount, condition = Condition.Gt, threshold = Left(0)),
        Seq("orders", "lineitem")))),

    // anomaly: MAD robust z-score per dimension (SURVEY §2.10)
    "q_check_anomaly" -> ((s, dir) => {
      val history = t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("run_time"))
        .agg(count(lit(1)).cast(DoubleType).as("actual_value"))
        .withColumn("check_id", lit("evtcount"))
      val c = Check("daily_volume", Seq("metrics"), CheckType.Anomaly,
        condition = Condition.Between, threshold = Right((-3.5, 3.5)),
        dimensions = Seq("event_type"), checkId = Some("evtcount"))
      AnomalyJob.run(c, history)
        .select(col("event_type"), round(col("z_score"), 4).as("z_score"),
          col("last_value"), col("n"), col("success"))
    }),

    // metric-store summary counts (SURVEY §2.4 A10)
    "q_metrics_summary" -> ((s, dir) => {
      val rows = runCheck(s, dir, check("orders_by_priority", "orders",
        CheckType.RowCount, condition = Condition.Gt, threshold = Left(3000),
        dims = Seq("o_orderpriority")), Seq("orders"))
      rows.agg(count(lit(1)).as("total"),
        sum(when(col("success"), 1L).otherwise(0L)).as("success_count"),
        sum(when(col("fail"), 1L).otherwise(0L)).as("fail_count"))
    }),

    // latest-value-per-key semantic measure (SURVEY §2.5 W1) — max_by
    "q_latest_metric" -> ((s, dir) => t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(max_by(col("value"), col("event_id")).as("last_value"),
        max(col("event_id")).as("last_event_id"))),

    // ordered history list (SURVEY §2.4 A12 / W2). The list itself is the
    // operator; it is emitted JOINED to a string because the driver's
    // pandas comparator cannot sort ARRAY columns (round-1 `err`).
    "q_history_list" -> ((s, dir) => t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("d"), col("n")))),
        x => x.getField("n").cast(StringType)), "|").as("history"))),

    // ---- joins (SURVEY §2.3) ----
    "q_join_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
    }),

    "q_join_densify" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val days = e.select(date_trunc("day", col("ts")).as("d")).distinct()
      val types = e.select(col("event_type")).distinct()
      val counts = e.groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("d")).agg(count(lit(1)).as("n"))
      types.crossJoin(days)
        .join(counts, Seq("event_type", "d"), "left")
        .select(col("event_type"), col("d"), coalesce(col("n"), lit(0L)).as("n"))
    }),

    // right side restricted to high-price orders so survivors exist at
    // every scale factor (3/30/308 rows at sf0.001/0.01/0.1) — an
    // unfiltered right side left both engines returning 0 rows, which
    // compares empty sets and proves nothing
    "q_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey"))
    }),

    "q_semi_join" -> ((s, dir) => {
      val su = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
      su.join(li, su("s_suppkey") === li("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_nationkey"))
    }),

    // broadcast dim-tree join: region <- nation <- customer
    "q_join_broadcast_dims" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n_customers"))
    }),

    // ---- sorts / limits / top-k (SURVEY §2.6) ----
    "q_topk" -> ((s, dir) => t(s, dir, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey").asc).limit(20)),

    // ---- set ops (SURVEY §2.7) ----
    "q_union_rollup" -> ((s, dir) => {
      val per = t(s, dir, "lineitem").groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"))
      val all = t(s, dir, "lineitem")
        .agg(count(lit(1)).as("n")).select(lit("ALL").as("flag"), col("n"))
      per.unionByName(all)
    }),

    // ---- scalar functions (SURVEY §2.8 F1-F11) ----
    // millennium/century/decade emitted as their YEAR (int): pre-1677
    // timestamps silently overflow the driver harness's pandas
    // datetime64[ns] on the parquet side (round-1 hash-fail artifact); the
    // truncation logic is identical, only the emitted type changes
    "q_scalar_funcs" -> ((s, dir) => t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(min(col("o_orderdate")).as("first_date"))
      .select(
        col("o_orderpriority"),
        year(CheckCompiler.dateTrunc("millennium", col("first_date")))
          .as("millennium_year"),
        year(CheckCompiler.dateTrunc("century", col("first_date")))
          .as("century_year"),
        year(CheckCompiler.dateTrunc("decade", col("first_date")))
          .as("decade_year"),
        CheckCompiler.dateTrunc("quarter", col("first_date")).as("quarter"),
        sha2(concat(lit("default"), col("o_orderpriority")), 256).as("check_id"),
        when(col("o_orderpriority") === "1-URGENT", "fail")
          .otherwise("success").as("status"),
        array_join(array(lit(10.5), lit(20.5)), ",").as("threshold_str"),
        coalesce(lit(null).cast(DoubleType), lit(0.0)).as("coalesced"))),

    // ---- event-time tumbling window, batch twin of the streaming job ----
    "q_event_window" -> ((s, dir) =>
      EventStream.windowedAgg(t(s, dir, "events"))),

    // gap sessionization (lag + running-sum windows, SURVEY §2.5 extension)
    "q_sessionize" -> ((s, dir) =>
      EventStream.sessionize(t(s, dir, "events"))),

    // native session_window operator (streaming-capable twin): note the
    // boundary difference — session_window splits at diff >= gap (exact
    // microseconds), sessionize at diff > gap (whole seconds); the oracle
    // re-derives the session_window rule precisely
    "q_session_window" -> ((s, dir) =>
      EventStream.sessionWindowAgg(t(s, dir, "events"))),

    // ---- text analysis over documents ----
    "text_quality" -> ((s, dir) => tp(s, dir, "documents").select(
      col("doc_id"),
      Heuristics.docLength(col("text")).as("doc_length"),
      Heuristics.wordCount(col("text")).as("word_count"),
      Heuristics.tokenCount(col("text")).as("token_count"),
      round(Heuristics.symbolWordRatio(col("text")), 6).as("symbol_word_ratio"),
      round(Heuristics.stopwordFraction(col("text")), 6).as("stopword_fraction"),
      round(Heuristics.wordRepetitionRatio(col("text")), 6).as("word_repetition"),
      Heuristics.qualityScore(col("text")).as("quality_score"),
      round(Heuristics.scriptNoSpaceFraction(col("text")), 6)
        .as("script_nospace_fraction"),
      round(Heuristics.symbolRatioAdaptive(col("text")), 6)
        .as("symbol_ratio_adaptive"),
      round(Heuristics.stopwordFractionAdaptive(col("text")), 6)
        .as("stopword_fraction_adaptive"),
      round(Heuristics.repetitionAdaptive(col("text")), 6)
        .as("repetition_adaptive"))),

    "text_fingerprint" -> ((s, dir) => t(s, dir, "documents").select(
      col("doc_id"), Heuristics.fingerprintMd5(col("text")).as("fingerprint"),
      Heuristics.rollingHash(col("text")).as("rolling_hash"))),

    // URL canonicalization over deterministically-constructed messy urls
    // (mixed-case scheme/host, default ports, tracking params, fragments,
    // a non-URL passthrough row) — both engines build the SAME inputs
    // from doc_id, so the oracle tests the normalizer, not the fixture
    "url_normalize" -> ((s, dir) => {
      val m = col("doc_id") % 4
      val raw = when(m === 0, concat(lit("HTTPS://Example"),
          col("doc_id") % 5, lit(".COM:443/Path/"), col("doc_id"),
          lit("?utm_source=x&b="), col("doc_id") % 3,
          lit("&a=1&fbclid=zz#frag")))
        .when(m === 1, concat(lit("http://WWW.Site"), col("doc_id") % 7,
          lit(".org:80")))
        .when(m === 2, concat(lit("https://cdn.Host.net/a//b/"),
          col("doc_id"), lit("?z=9&y="), col("doc_id") % 2,
          lit("&utm_campaign=c")))
        .otherwise(concat(lit("not a url "), col("doc_id")))
      t(s, dir, "documents").select(col("doc_id"), raw.as("raw_url"),
        graft.operators.Curation.normalizeUrl(raw).as("normalized_url"))
    }),

    // token counting, three estimators: whitespace words, the simple
    // letter/digit/punct regex, and the GPT-2-shaped BPE-ish pattern
    "text_tokens" -> ((s, dir) => tp(s, dir, "documents").select(
      col("doc_id"),
      Heuristics.wordCount(col("text")).as("ws_tokens"),
      Heuristics.tokenCount(col("text")).as("regex_tokens"),
      Heuristics.bpeTokenCount(col("text")).as("bpe_tokens"))),

    // langid + perplexity: model measures, not SQL-expressible (rows-only)
    "text_langid" -> ((s, dir) =>
      graft.functions.ModelScores.withScores(
        tp(s, dir, "documents").select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("lang_pred"),
          round(col("langid_score"), 6).as("langid_score"),
          round(col("ppl"), 4).as("ppl"))),

    // trained quality classifier over SCRUBBED text (pipeline order):
    // model output, not SQL-expressible (rows-only; SfGolden pin)
    "text_quality_model" -> ((s, dir) =>
      graft.functions.ModelScores.withQualityScore(
        tp(s, dir, "documents").select(col("doc_id"),
          graft.functions.Scrub.scrubFast(col("text")).as("text")), "text")
        .select(col("doc_id"),
          round(col("quality_prob"), 6).as("quality_prob"))),

    // ---- dedup family over documents ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(tp(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("fingerprint"), col("is_dup"))),

    "dedup_jaccard_pairs" -> ((s, dir) => {
      val d = tp(s, dir, "documents")
        .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("shs"))
      val a = d.select(col("doc_id").as("key_a"), col("shs").as("sa"))
      val b = d.select(col("doc_id").as("key_b"), col("shs").as("sb"))
      a.join(b, col("key_b") === col("key_a") + 1)
        .select(col("key_a"), col("key_b"),
          round(size(array_intersect(col("sa"), col("sb"))).cast(DoubleType) /
            (size(col("sa")) + size(col("sb")) -
              size(array_intersect(col("sa"), col("sb")))).cast(DoubleType), 6)
            .as("jaccard"))
    }),

    // dup GRAPH: exact-dup links (jaccard 1.0) + near-dup pairs among
    // distinct-text representatives, LSH-proposed and EXACTLY verified
    // (true shingle Jaccard >= 0.5) — so the DuckDB oracle can compute
    // the identical set brute-force
    // maxBucketSize 600 > the 500-doc oracle corpus, so the gate compares
    // pure full-expansion output; bigger corpora (sf0.1 bench) star-expand
    // hot buckets instead of quadratically exploding.
    //
    // CORPUS-MARGIN ASSUMPTION (what makes equality vs the brute-force
    // oracle below a fair gate): LSH banding is probabilistic — a pair at
    // jaccard just above 0.5 is missed with prob (1-0.5^4)^16 ≈ 0.36 under
    // 16 bands x 4 rows. The gate holds because the synthetic corpus has
    // no borderline pairs: its near-dup pairs are seeded high-overlap
    // mutations (observed est_jaccard >= 0.9, where the miss prob is
    // (1-0.9^4)^16 ≈ 2e-9) and everything else sits far below 0.5. On a
    // corpus WITH borderline pairs the correct expectation is
    // Spark ⊆ oracle (LSH may legitimately miss near-threshold pairs) —
    // that containment (plus exactness of every emitted jaccard) is what
    // LSH guarantees, and DedupSpec asserts the recall property
    // separately. A gate break here after a corpus change means the
    // margin assumption broke, not necessarily the code.
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshDedup(tp(s, dir, "documents"), "doc_id", "text",
        jaccardThreshold = 0.5, maxBucketSize = 600)
        .select(col("key_a"), col("key_b"),
          round(col("jaccard"), 6).as("jaccard"))),

    // dup-graph -> dedup DECISIONS: hash-min connected components over
    // the minhash dup graph; every doc gets (cluster_id, keep). Oracle is
    // the recursive-SQL transitive closure of the same graph.
    "dedup_clusters" -> ((s, dir) => {
      val docs = tp(s, dir, "documents")
      val pairs = Dedup.minhashLshDedup(docs, "doc_id", "text",
        jaccardThreshold = 0.5, maxBucketSize = 600)
        .select("key_a", "key_b")
      Dedup.dedupDecisions(docs, pairs, "doc_id")
    }),

    // the stage-checkpointed DAG, driven end-to-end through fresh
    // checkpoint commits each call — must hash-match the same oracle as
    // dedup_clusters (deterministic stages => identical decisions)
    "dedup_resumable" -> ((s, dir) => {
      val stages = java.nio.file.Files
        .createTempDirectory("dedup_resumable_stages").toString
      Dedup.dedupResumable(tp(s, dir, "documents"), "doc_id", "text",
        stages, jaccardThreshold = 0.5, maxBucketSize = 600)._1
    }),

    // dup graph via simhash: links (hamming 0) + ALL representative pairs
    // within hamming<=3 — pigeonhole candidates are exhaustive, so the
    // oracle's brute-force FNV/simhash in SQL reproduces the exact set
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashDedup(tp(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, maxBucketSize = 600)
        .select(col("key_a"), col("key_b"),
          col("hamming").cast(LongType).as("hamming"))),

    "dedup_ngram_inverted" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(tp(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5)),

    // INCREMENTAL snapshot-over-corpus dedup: fresh = doc_id % 4 in
    // {1, 2} (so consecutive seeded near-dup pairs land both fresh-fresh
    // AND fresh-corpus), corpus = the rest. Same corpus-margin assumption
    // as dedup_minhash_lsh (documented above). resolved_to = the corpus
    // doc / kept fresh head this doc resolves to (itself when kept) —
    // null-free so the gate's pandas row sort stays int64 on both sides.
    "dedup_incremental" -> ((s, dir) => {
      val docs = tp(s, dir, "documents")
      val isFresh = col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2
      Dedup.dedupIncremental(docs.filter(!isFresh), docs.filter(isFresh),
        "doc_id", "text", jaccardThreshold = 0.5, maxBucketSize = 600)
        .select(col("doc_id"), col("keep"),
          coalesce(col("dup_of"), col("doc_id")).as("resolved_to"))
    }),

    // ---- corpus curation ----
    // benchmark decontamination: the "eval set" is a deterministic slice
    // of the corpus itself (doc_id % 50 == 0) so the gate needs no
    // external data; grams are the pinned 3-word shingle twin
    "decontaminate" -> ((s, dir) => {
      val docs = tp(s, dir, "documents")
      Curation.decontaminate(
        docs, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text")
    }),

    // deterministic per-language token-budget sampler: keep-rate =
    // min(1, 2000 / lang_token_total), membership = first 32 md5 bits of
    // the key as a fraction of 2^32 — both re-derivable in SQL
    "sample_budget" -> ((s, dir) =>
      Curation.sampleByTokenBudget(tp(s, dir, "documents"),
        "doc_id", "text", "lang", budgetTokens = 2000L)),

    // line-level boilerplate removal: the corpus has single-line texts,
    // so the gate manufactures line structure deterministically (a nav
    // header + copyright footer wrapped around every even doc_id) —
    // mirrored byte-for-byte in the oracle CTE; the shared lines exceed
    // the doc-frequency cap and must be stripped, body lines survive
    "lines_dedup" -> ((s, dir) => {
      val withBoiler = tp(s, dir, "documents").select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat_ws("\n", lit("NAV MENU HOME ABOUT CONTACT"),
            coalesce(col("text"), lit("")),
            lit("COPYRIGHT 2024 EXAMPLE INC ALL RIGHTS RESERVED")))
          .otherwise(coalesce(col("text"), lit(""))).as("text"))
      Curation.dedupLines(withBoiler, "doc_id", "text", maxDocFreq = 10L)
    }),

    // sequence packing: md5-bucketed concat-and-chunk bookkeeping into
    // 512-token training sequences over 8 independent packing streams
    "pack_sequences" -> ((s, dir) =>
      Curation.packSequences(tp(s, dir, "documents"), "doc_id", "text",
        seqLen = 512L, buckets = 8)),

    // exact substring dedup: every 15-token window appearing verbatim in
    // >= 2 distinct documents is removed from all of them; texts are
    // rebuilt from surviving tokens (single-space joined)
    "dedup_substring" -> ((s, dir) =>
      Dedup.substringDedup(tp(s, dir, "documents"), "doc_id", "text",
        windowTokens = 15)),

    // url-level curation over pages: src3 is fully blocklisted, urls
    // containing "doc/13" are pattern-banned, and every host is capped
    // at ~18 eligible docs by the deterministic md5-threshold rule
    "url_filter" -> ((s, dir) =>
      Curation.urlFilter(pagesP(s, dir), "url",
        blockedHosts = Seq("src3.example.com"),
        bannedUrlParts = Seq("doc/13"), maxDocsPerHost = 18L)),

    // ---- similarity search over embeddings ----
    "ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    // multi-probe sign-LSH top-k; hyperplanes are md5-derived so the
    // DuckDB oracle re-derives identical buckets and probes
    "ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      Similarity.lshTopK(e, "vec_id", "embedding", q, 10, bits = 4, probes = 2)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    "emb_cosine_pairs" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("key_a"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("key_b"), col("embedding").as("vb"))
      a.join(b, col("key_b") === col("key_a") + 1)
        .select(col("key_a"), col("key_b"),
          round(Similarity.cosine(col("va"), col("vb")), 6).as("cosine"))
    }),

    // SemDeDup-style semantic dedup: deterministic IVF cells (same md5
    // centroid sample as ann_ivf), within-cell cosine pairs, min-key
    // component representatives. Threshold 0.35 because the synthetic
    // embeddings are near-orthogonal (max in-cell cosine ~0.49): the
    // gate must see non-trivial components, not an all-keep identity
    "dedup_semantic" -> ((s, dir) =>
      Similarity.semanticDedup(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 8, cosineThreshold = 0.35)),

    // incremental semantic dedup: fresh = vec_id%4 in (1,2), corpus
    // priority, shared corpus-derived cells (same split/shape as
    // dedup_incremental's text twin)
    "dedup_semantic_incremental" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val isFresh = col("vec_id") % 4 === 1 || col("vec_id") % 4 === 2
      Similarity.semanticDedupIncremental(e.filter(!isFresh),
        e.filter(isFresh), "vec_id", "embedding",
        k = 8, cosineThreshold = 0.35)
        .select(col("vec_id"), col("keep"),
          coalesce(col("dup_of"), col("vec_id")).as("resolved_to"))
    }),

    // ---- quality-filter pipeline over synthesized pages ----
    "scrub_pii" -> ((s, dir) => pagesP(s, dir)
      .select(col("url"), Scrub.scrub(col("text")).as("scrubbed_text"))),

    "pipeline_verdict" -> ((s, dir) => {
      val v = QualityFilter.run(pagesP(s, dir), QualityFilter.heuristicRules)
      // fail_reasons joined to a string: driver's comparator can't sort
      // ARRAY columns (round-1 `err`); order is rule-declaration order on
      // both sides, so the joined string is deterministic
      v.select(col("url"), col("keep"),
        array_join(col("fail_reasons"), "|").as("fail_reasons"),
        col("quality_score"))
    }),

    // verdict pipeline + per-url-bucket lineage metrics, fully oracled:
    // the lineage key is the deterministic md5 url bucket, so DuckDB can
    // re-derive every row incl. check_id (heuristic rule set — the model
    // measures aren't SQL-expressible; their lineage is covered by
    // PipelineSpec determinism tests + text_langid)
    "pipeline_full" -> ((s, dir) => {
      val v = QualityFilter.run(pagesP(s, dir), QualityFilter.heuristicRules)
      QualityFilter.partitionMetrics(v, QualityFilter.heuristicRules,
        runId, runTime)
        .select(col("check_id"), col("name"), col("url_bucket"),
          col("actual_value"), col("doc_count"), col("pass_count"),
          col("fail_count"), col("success"), col("fail"))
    }),

    // ---- multimodal binary-column handling ----
    // salted per-host keep/drop stats (north rule: skewed hosts)
    "pipeline_host_stats" -> ((s, dir) =>
      QualityFilter.hostStats(
        QualityFilter.run(pagesP(s, dir), QualityFilter.heuristicRules))),

    // IVF-bucketed ANN; centroids are an md5-strided sample, so the
    // DuckDB oracle selects identical centroids/cells
    "ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      Similarity.ivfTopK(e, "vec_id", "embedding", q, 10, k = 8, probes = 3)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    "multimodal_meta" -> ((s, dir) =>
      Multimodal.mediaMeta(pagesP(s, dir), "url", "html")),

    "multimodal_features" -> ((s, dir) =>
      Multimodal.withMediaFeatures(pagesP(s, dir)
        .select(col("url"), col("html")), "html")
        .select(col("url"), col("media_format"), col("media_bytes"),
          // feature vector joined to a string: the driver's comparator
          // can't sort ARRAY columns (round-1 `err`)
          array_join(transform(col("media_features"),
            x => round(x.cast(DoubleType), 4).cast(StringType)), "|")
            .as("media_features"))),

    // REAL WAV/RIFF metadata parsing (byte arithmetic, no codec). The WAV
    // bytes are synthesized deterministically from doc_id (the fixture
    // generator, like pagesCte builds html from text); the oracle
    // re-derives the header fields the parser must recover.
    "multimodal_audio" -> ((s, dir) => {
      val synth = udf { id: Long =>
        Multimodal.synthWav(8000 + (id % 5).toInt * 1000,
          1 + (id % 2).toInt, 16, 100 + (id % 50).toInt)
      }
      Multimodal.audioMeta(
        tp(s, dir, "documents")
          .select(col("doc_id"), synth(col("doc_id")).as("wav")),
        "doc_id", "wav")
    }),

    // REAL uncompressed-AVI pixel decode (byte arithmetic, no codec):
    // per-doc synthetic BI_RGB AVIs (the fixture generator, like the WAV
    // one above); the oracle re-derives dimensions, duration and the
    // integer mean luminance of every sampled-and-DECODED frame straight
    // from the pixel formula — exact integer arithmetic on both sides.
    // Widths 5/7/9 force nonzero DIB row padding, so the byte layout
    // (bottom-up rows, 4-byte stride) is itself under test.
    "multimodal_video" -> ((s, dir) => {
      val synth = udf { id: Long =>
        Multimodal.synthAviRgb(5 + (id % 3).toInt * 2, 4 + (id % 3).toInt,
          40000, 5 + (id % 4).toInt)
      }
      Multimodal.videoMeta(
        tp(s, dir, "documents")
          .select(col("doc_id"), synth(col("doc_id")).as("avi")),
        "doc_id", "avi")
        .select(col("doc_id"), col("width"), col("height"),
          col("total_frames"), col("duration_ms"),
          // joined to a string: the driver's comparator can't sort ARRAY
          // columns (round-1 `err`)
          array_join(transform(col("frame_means"),
            x => x.cast(StringType)), "|").as("frame_means"))
    })
  )

  // ------------------------------------------------------------- oracleSql

  private val pagesCte = Pages.duckdbCte

  /** DuckDB list literal of the (single-source-of-truth) stopword list. */
  private val stopList =
    Heuristics.stopwords.map(w => s"'$w'").mkString("[", ",", "]")

  /** No-space-script code-point class (zh/ja/th), the RE2 twin of
    * TextStats.isNoSpaceScript — \x{..} ranges parse identically in RE2
    * and java.util.regex.
    */
  private val noSpaceClass =
    "\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}" +
      "\\x{F900}-\\x{FAFF}\\x{0E01}-\\x{0E4E}"

  /** Sum of code points covered by non-overlapping occurrences of each
    * no-space stopword: Σ_w (length(t) - length(replace(t, w, ''))) —
    * replace() is greedy-left non-overlapping, exactly the JVM indexOf
    * walk in TextStats.noSpaceStopCover.
    */
  private def noSpaceCoverSql(t: String): String =
    graft.functions.TextStats.noSpaceStopwords
      .map(w => s"(length($t) - length(replace($t, '$w', '')))")
      .mkString("(", " + ", ")")

  /** Duplicated code-point 4-gram fraction, the repetition twin for
    * no-space scripts: (total - distinct)/total over substr 4-grams.
    */
  private def char4DupSql(t: String): String =
    s"""CASE WHEN length($t) < 4 THEN 0.0
       |     ELSE (length($t) - 3 - len(list_distinct(list_transform(
       |            range(length($t) - 3), i -> ($t)[(i+1):(i+4)]))))::DOUBLE /
       |          (length($t) - 3)::DOUBLE END""".stripMargin

  private val docWords =
    """list_filter(string_split_regex(coalesce(text, ''), '\s+'),
      |            x -> length(x) > 0)""".stripMargin

  private val docShingles =
    s"""CASE WHEN len($docWords) < 3
       |     THEN [array_to_string($docWords, ' ')]
       |     ELSE list_distinct(list_transform(
       |       range(1, len($docWords) - 1),
       |       i -> ($docWords)[i] || ' ' ||
       |            ($docWords)[i+1] || ' ' ||
       |            ($docWords)[i+2]))
       |END""".stripMargin

  /** Transitive closure of the minhash dup graph in recursive SQL: the
    * shared oracle of dedup_clusters AND dedup_resumable — the one-shot
    * pipeline and the stage-checkpointed DAG must land on identical
    * decisions.
    */
  private lazy val dedupClustersSql: String =
    s"""WITH RECURSIVE $minhashGraphCtes,
       |edges0 AS (
       |  SELECT key_a, key_b FROM pairs
       |  WHERE inter::DOUBLE / (na + nb - inter)::DOUBLE >= 0.5
       |  UNION ALL SELECT key_a, key_b FROM links),
       |sym AS (SELECT key_a AS a, key_b AS b FROM edges0
       |        UNION SELECT key_b, key_a FROM edges0),
       |cc AS (SELECT a AS node, a AS lbl FROM sym
       |       UNION SELECT e.b, cc.lbl FROM cc JOIN sym e ON e.a = cc.node),
       |m AS (SELECT node, min(lbl) AS lbl FROM cc GROUP BY node)
       |SELECT doc_id, coalesce(m.lbl, doc_id) AS cluster_id,
       |  coalesce(m.lbl, doc_id) = doc_id AS keep
       |FROM documents LEFT JOIN m ON m.node = doc_id""".stripMargin

  /** Brute-force twin of Dedup.dedupIncremental on the same fresh/corpus
    * split as the gate query: fresh-fresh edges (byte-equal OR jaccard >=
    * 0.5) close transitively; a component with any fresh-corpus edge
    * resolves to its smallest linked corpus doc; otherwise min-key wins.
    * The inverted-index join loses nothing vs all-pairs (any pair at
    * jaccard >= 0.5 shares a shingle); empty-text docs pair only through
    * the fingerprint arm on both sides (unnest of a NULL shingle row
    * never equijoins), mirroring the operator's exactCross path.
    */
  private lazy val dedupIncrementalSql: String =
    s"""WITH RECURSIVE
       |fall AS (SELECT doc_id, coalesce(text, '') AS text,
       |           md5(coalesce(text, '')) AS f FROM documents),
       |fr AS (SELECT * FROM fall WHERE doc_id % 4 IN (1, 2)),
       |cp AS (SELECT * FROM fall WHERE doc_id % 4 NOT IN (1, 2)),
       |df AS (SELECT doc_id, $docShingles AS shs FROM fr),
       |dc AS (SELECT doc_id, $docShingles AS shs FROM cp),
       |invf AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM df),
       |invc AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM dc),
       |pf AS (
       |  SELECT a.doc_id AS key_a, b.doc_id AS key_b,
       |         a.n_sh AS na, b.n_sh AS nb, count(*) AS inter
       |  FROM invf a JOIN invf b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |edges0 AS (
       |  SELECT key_a, key_b FROM pf
       |  WHERE inter::DOUBLE / (na + nb - inter)::DOUBLE >= 0.5
       |  UNION SELECT a.doc_id, b.doc_id FROM fr a
       |        JOIN fr b ON a.f = b.f AND a.doc_id < b.doc_id),
       |sym AS (SELECT key_a AS a, key_b AS b FROM edges0
       |        UNION SELECT key_b, key_a FROM edges0),
       |cc AS (SELECT a AS node, a AS lbl FROM sym
       |       UNION SELECT e.b, cc.lbl FROM cc JOIN sym e ON e.a = cc.node),
       |m AS (SELECT node, min(lbl) AS lbl FROM cc GROUP BY node),
       |comp AS (SELECT fr.doc_id, coalesce(m.lbl, fr.doc_id) AS cluster_id
       |         FROM fr LEFT JOIN m ON m.node = fr.doc_id),
       |pc AS (
       |  SELECT a.doc_id AS fk, c.doc_id AS ck,
       |         a.n_sh AS na, c.n_sh AS nb, count(*) AS inter
       |  FROM invf a JOIN invc c ON a.sh = c.sh
       |  GROUP BY 1, 2, 3, 4),
       |crosse AS (
       |  SELECT fk, ck FROM pc
       |  WHERE inter::DOUBLE / (na + nb - inter)::DOUBLE >= 0.5
       |  UNION SELECT a.doc_id, c.doc_id FROM fr a
       |        JOIN cp c ON a.f = c.f),
       |clc AS (SELECT comp.cluster_id, min(crosse.ck) AS corpus_dup
       |        FROM crosse JOIN comp ON comp.doc_id = crosse.fk
       |        GROUP BY 1)
       |SELECT comp.doc_id,
       |  (comp.cluster_id = comp.doc_id AND clc.corpus_dup IS NULL) AS keep,
       |  coalesce(clc.corpus_dup,
       |    CASE WHEN comp.cluster_id <> comp.doc_id THEN comp.cluster_id END,
       |    comp.doc_id) AS resolved_to
       |FROM comp LEFT JOIN clc ON clc.cluster_id = comp.cluster_id""".stripMargin

  /** Shared CTE chain building the minhash dup graph (exact-dup links +
    * inverted-index pair candidates with exact jaccard terms) — used by
    * the dedup_minhash_lsh and dedup_clusters oracles.
    */
  private val minhashGraphCtes: String =
    s"""fp AS (SELECT doc_id, coalesce(text, '') AS text,
       |         md5(coalesce(text, '')) AS f FROM documents),
       |g AS (SELECT f, min(doc_id) AS rep FROM fp GROUP BY f),
       |links AS (SELECT g.rep AS key_a, fp.doc_id AS key_b,
       |            1.0::DOUBLE AS jaccard
       |          FROM fp JOIN g USING (f) WHERE fp.doc_id <> g.rep),
       |reps AS (SELECT fp.doc_id, fp.text FROM fp JOIN g
       |         ON fp.f = g.f AND fp.doc_id = g.rep),
       |d AS (SELECT doc_id, $docShingles AS shs FROM reps),
       |inv AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM d),
       |pairs AS (
       |  SELECT a.doc_id AS key_a, b.doc_id AS key_b,
       |         a.n_sh AS na, b.n_sh AS nb, count(*) AS inter
       |  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)""".stripMargin

  /** The heuristic-rule verdict oracle. Round 6: the three word rules are
    * script-ADAPTIVE — no-space-script-dominant documents (>= 30% zh/ja/
    * th code points) evaluate char-based twins (symbols per code point,
    * stopword substring coverage, duplicated char 4-grams) so UNSEGMENTED
    * CJK/Thai prose is judged by rules that can see it. quality_score
    * deliberately keeps the original word-based formula (its definition
    * is frozen with the goldens).
    */
  private val pipelineVerdictSql: String =
    s"""WITH $pagesCte,
           |m AS (
           |  SELECT url, text,
           |    list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
           |                x -> length(x) > 0) AS words
           |  FROM pages),
           |r0 AS (
           |  SELECT url, text, words,
           |    length(coalesce(text,'')) AS dl,
           |    length(regexp_replace(coalesce(text,''), '[\\p{L}\\p{M}\\p{N}\\s]', '', 'g')) AS sym,
           |    (length(regexp_replace(coalesce(text,''), '[^$noSpaceClass]', '', 'g'))::DOUBLE /
           |      greatest(length(coalesce(text,'')), 1)::DOUBLE >= 0.3) AS nsb,
           |    ${noSpaceCoverSql("coalesce(text,'')")} AS cover,
           |    ${char4DupSql("coalesce(text,'')")} AS c4,
           |    len(list_filter(words, x -> list_contains(
           |      $stopList, lower(x))))::DOUBLE /
           |      greatest(len(words), 1)::DOUBLE AS stop,
           |    CASE WHEN len(words) = 0 THEN 0.0
           |         ELSE 1.0 - len(list_distinct(words))::DOUBLE / len(words)::DOUBLE
           |    END AS rep,
           |    CASE WHEN len(words) < 2 THEN 0.0
           |         ELSE (len(words) - 1 - len(list_distinct(
           |           list_transform(range(1, len(words)),
           |             i -> words[i] || ' ' || words[i+1]))))::DOUBLE /
           |           (len(words) - 1)::DOUBLE
           |    END AS b2,
           |    0.0 AS dup
           |  FROM m),
           |r AS (
           |  SELECT url, text, words, dl, stop, rep, b2, dup,
           |    sym::DOUBLE / greatest(len(words), 1)::DOUBLE AS swr,
           |    CASE WHEN nsb THEN sym::DOUBLE / greatest(dl, 1)::DOUBLE
           |         ELSE sym::DOUBLE / greatest(len(words), 1)::DOUBLE END AS swr_a,
           |    CASE WHEN nsb THEN cover::DOUBLE / greatest(dl, 1)::DOUBLE
           |         ELSE stop END AS stop_a,
           |    CASE WHEN nsb THEN c4 ELSE rep END AS rep_a
           |  FROM r0)
           |SELECT url,
           |  (dl >= 100) AND (swr_a <= 0.1) AND (stop_a >= 0.01) AND (rep_a <= 0.95)
           |    AND (b2 <= 0.5) AND (dup <= 0.3) AS keep,
           |  list_filter([
           |    CASE WHEN NOT (dl >= 100) THEN 'min_doc_length' END,
           |    CASE WHEN NOT (swr_a <= 0.1) THEN 'max_symbol_word_ratio' END,
           |    CASE WHEN NOT (stop_a >= 0.01) THEN 'min_stopword_fraction' END,
           |    CASE WHEN NOT (rep_a <= 0.95) THEN 'max_word_repetition' END,
           |    CASE WHEN NOT (b2 <= 0.5) THEN 'max_dup_2gram' END,
           |    CASE WHEN NOT (dup <= 0.3) THEN 'max_dup_line_fraction' END],
           |    x -> x IS NOT NULL) AS fail_reasons,
           |  round(
           |    least(dl::DOUBLE / 500.0, 1.0) * 0.3 +
           |    least(stop / 0.1, 1.0) * 0.3 +
           |    greatest(1.0 - swr * 2.0, 0.0) * 0.2 +
           |    greatest(1.0 - rep, 0.0) * 0.2, 6) AS quality_score
           |FROM r""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_check_row_count" ->
      """SELECT 'row_count_lineitem' AS name,
        |  sha256('default' || 'row_count_lineitem' || 'lineitem') AS check_id,
        |  count(*)::DOUBLE AS actual_value,
        |  count(*) > 1000 AS success, NOT (count(*) > 1000) AS fail
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,

    "q_check_row_count_dims" ->
      """SELECT 'orders_by_priority_o_orderpriority_' || o_orderpriority AS name,
        |  sha256('default' || 'orders_by_priority_o_orderpriority_' ||
        |         o_orderpriority || 'orders') AS check_id,
        |  count(*)::DOUBLE AS actual_value,
        |  count(*) > 10 AS success, NOT (count(*) > 10) AS fail
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_check_sum_time" ->
      """SELECT 'sum_qty_l_returnflag_' || l_returnflag ||
        |  '_l_shipdate_month_' || date_trunc('month', l_shipdate)::TIMESTAMP::VARCHAR AS name,
        |  sha256('default' || 'sum_qty_l_returnflag_' || l_returnflag ||
        |    '_l_shipdate_month_' || date_trunc('month', l_shipdate)::TIMESTAMP::VARCHAR ||
        |    'lineitem') AS check_id,
        |  sum(l_quantity)::DOUBLE AS actual_value,
        |  sum(l_quantity) > 100 AS success, NOT (sum(l_quantity) > 100) AS fail
        |FROM lineitem GROUP BY l_returnflag, date_trunc('month', l_shipdate)""".stripMargin,

    "q_check_min" ->
      """SELECT 'min_price_o_orderpriority_' || o_orderpriority AS name,
        |  sha256('default' || 'min_price_o_orderpriority_' || o_orderpriority
        |    || 'orders') AS check_id,
        |  round(min(o_totalprice), 4) AS actual_value,
        |  min(o_totalprice) >= 0 AS success,
        |  NOT (min(o_totalprice) >= 0) AS fail
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_check_max" ->
      """SELECT 'max_price_o_orderstatus_' || o_orderstatus AS name,
        |  sha256('default' || 'max_price_o_orderstatus_' || o_orderstatus
        |    || 'orders') AS check_id,
        |  round(max(o_totalprice), 4) AS actual_value,
        |  max(o_totalprice) <= 1000000 AS success,
        |  NOT (max(o_totalprice) <= 1000000) AS fail
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_check_numeric_between" ->
      """SELECT 'avg_price_band' AS name,
        |  sha256('default' || 'avg_price_band' || 'orders') AS check_id,
        |  round(avg(o_totalprice), 4) AS actual_value,
        |  (avg(o_totalprice) >= 1000.0 AND avg(o_totalprice) <= 500000.0) AS success,
        |  NOT (avg(o_totalprice) >= 1000.0 AND avg(o_totalprice) <= 500000.0) AS fail
        |FROM orders""".stripMargin,

    "q_check_not_empty" ->
      """WITH ds AS (SELECT nullif(event_type, 'click') AS et2, value FROM events),
        |agg AS (SELECT
        |  sum(CASE WHEN et2 IS NULL THEN 1 ELSE 0 END)::DOUBLE AS v_et2,
        |  sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::DOUBLE AS v_value
        |FROM ds)
        |SELECT u.name,
        |  sha256('default' || u.name || 'events') AS check_id,
        |  u.actual_value, u.actual_value <= 0 AS success,
        |  NOT (u.actual_value <= 0) AS fail
        |FROM (SELECT 'evt_not_empty_et2_not_empty' AS name, v_et2 AS actual_value FROM agg
        |      UNION ALL
        |      SELECT 'evt_not_empty_value_not_empty', v_value FROM agg) u""".stripMargin,

    "q_check_not_empty_pct" ->
      """WITH ds AS (SELECT nullif(event_type, 'click') AS et2, value FROM events),
        |agg AS (SELECT
        |  sum(CASE WHEN et2 IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS v_et2,
        |  sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS v_value
        |FROM ds)
        |SELECT u.name,
        |  sha256('default' || u.name || 'events') AS check_id,
        |  round(u.actual_value, 4) AS actual_value,
        |  u.actual_value <= 0.5 AS success, NOT (u.actual_value <= 0.5) AS fail
        |FROM (SELECT 'evt_not_empty_pct_et2_not_empty_pct' AS name, v_et2 AS actual_value FROM agg
        |      UNION ALL
        |      SELECT 'evt_not_empty_pct_value_not_empty_pct', v_value FROM agg) u""".stripMargin,

    "q_check_multi_dataset" ->
      """SELECT 'rc_multi' AS name,
        |  sha256('default' || 'rc_multi' || 'orders') AS check_id,
        |  count(*)::DOUBLE AS actual_value, count(*) > 0 AS success,
        |  NOT (count(*) > 0) AS fail FROM orders
        |UNION ALL
        |SELECT 'rc_multi', sha256('default' || 'rc_multi' || 'lineitem'),
        |  count(*)::DOUBLE, count(*) > 0, NOT (count(*) > 0) FROM lineitem""".stripMargin,

    "q_check_anomaly" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('day', ts) AS d, count(*)::DOUBLE AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, median(v) AS med, mad(v) AS madv,
        |         arg_max(v, d) AS lst, count(*) AS n
        |  FROM h GROUP BY 1),
        |z AS (
        |  SELECT event_type,
        |    CASE WHEN floor(madv) = 0 THEN 0.0
        |         ELSE 0.6745 * (lst - med) / madv END AS zs,
        |    lst, n FROM s)
        |SELECT event_type, round(zs, 4) AS z_score, lst AS last_value, n,
        |  CASE WHEN n < 5 THEN false
        |       ELSE (zs >= -3.5 AND zs <= 3.5) END AS success
        |FROM z""".stripMargin,

    "q_metrics_summary" ->
      """WITH rows_ AS (
        |  SELECT count(*) > 3000 AS success FROM orders GROUP BY o_orderpriority)
        |SELECT count(*) AS total,
        |  sum(CASE WHEN success THEN 1 ELSE 0 END)::BIGINT AS success_count,
        |  sum(CASE WHEN NOT success THEN 1 ELSE 0 END)::BIGINT AS fail_count
        |FROM rows_""".stripMargin,

    "q_latest_metric" ->
      """SELECT event_type, arg_max(value, event_id) AS last_value,
        |  max(event_id) AS last_event_id
        |FROM events GROUP BY event_type""".stripMargin,

    "q_history_list" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('day', ts) AS d, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  array_to_string(list(n ORDER BY d ASC), '|') AS history
        |FROM h GROUP BY event_type""".stripMargin,

    "q_join_revenue" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q_join_densify" ->
      """WITH days AS (SELECT DISTINCT date_trunc('day', ts)::TIMESTAMP AS d FROM events),
        |types AS (SELECT DISTINCT event_type FROM events),
        |counts AS (SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS d, count(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT t.event_type, days.d, coalesce(c.n, 0) AS n
        |FROM types t CROSS JOIN days
        |LEFT JOIN counts c ON c.event_type = t.event_type AND c.d = days.d""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 300000)""".stripMargin,

    "q_semi_join" ->
      """SELECT s_suppkey, s_nationkey FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity >= 45)""".stripMargin,

    "q_join_broadcast_dims" ->
      """SELECT r_name, count(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY price DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "q_union_rollup" ->
      """SELECT l_returnflag AS flag, count(*) AS n FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT 'ALL', count(*) FROM lineitem""".stripMargin,

    "q_scalar_funcs" ->
      """WITH g AS (SELECT o_orderpriority, min(o_orderdate) AS first_date
        |           FROM orders GROUP BY 1)
        |SELECT o_orderpriority,
        |  year(date_trunc('millennium', first_date))::INT AS millennium_year,
        |  year(date_trunc('century', first_date))::INT AS century_year,
        |  year(date_trunc('decade', first_date))::INT AS decade_year,
        |  date_trunc('quarter', first_date)::TIMESTAMP AS quarter,
        |  sha256('default' || o_orderpriority) AS check_id,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 'fail'
        |       ELSE 'success' END AS status,
        |  array_to_string([10.5, 20.5], ',') AS threshold_str,
        |  coalesce(NULL::DOUBLE, 0.0) AS coalesced
        |FROM g""".stripMargin,

    "q_event_window" ->
      """SELECT date_trunc('hour', ts) +
        |  to_minutes((extract(minute FROM ts)::BIGINT // 5) * 5) AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS v
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR
        |    floor(epoch(ts))::BIGINT - floor(epoch(prev_ts))::BIGINT > 1800
        |    THEN 1 ELSE 0 END AS new_session FROM e),
        |g AS (
        |  SELECT *, sum(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id FROM f)
        |SELECT user_id, session_id, min(ts) AS session_start,
        |  max(ts) AS session_end, count(*) AS n_events,
        |  round(sum(value), 4) AS total_value
        |FROM g GROUP BY 1, 2""".stripMargin,

    // session_window semantics: split when the gap to the previous event
    // is >= 30 min in exact MICROSECONDS (the lag-chain formulation is
    // equivalent because events are processed in ts order)
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR
        |    epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
        |    THEN 1 ELSE 0 END AS new_session FROM e),
        |g AS (
        |  SELECT *, sum(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS sid FROM f)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) AS session_end, count(*) AS n_events,
        |  round(sum(value), 4) AS total_value
        |FROM g GROUP BY user_id, sid""".stripMargin,

    "text_quality" ->
      s"""WITH w AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
         |                x -> length(x) > 0) AS words
         |  FROM documents),
         |w2 AS (
         |  SELECT doc_id, text, words,
         |    length(coalesce(text,'')) AS dl,
         |    length(regexp_replace(coalesce(text,''), '[\\p{L}\\p{M}\\p{N}\\s]', '', 'g')) AS sym,
         |    length(regexp_replace(coalesce(text,''), '[^$noSpaceClass]', '', 'g')) AS ns,
         |    ${noSpaceCoverSql("coalesce(text,'')")} AS cover,
         |    ${char4DupSql("coalesce(text,'')")} AS c4,
         |    len(list_filter(words, x -> list_contains(
         |      $stopList, lower(x)))) AS stopn,
         |    CASE WHEN len(words) = 0 THEN 0.0
         |      ELSE 1.0 - len(list_distinct(words))::DOUBLE / len(words)::DOUBLE END AS rep
         |  FROM w)
         |SELECT doc_id,
         |  length(text) AS doc_length,
         |  len(words) AS word_count,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token_count,
         |  round(sym::DOUBLE / greatest(len(words), 1)::DOUBLE, 6) AS symbol_word_ratio,
         |  round(stopn::DOUBLE /
         |    greatest(len(words), 1)::DOUBLE, 6) AS stopword_fraction,
         |  round(rep, 6) AS word_repetition,
         |  round(
         |    least(length(text)::DOUBLE / 500.0, 1.0) * 0.3 +
         |    least((stopn::DOUBLE /
         |      greatest(len(words), 1)::DOUBLE) / 0.1, 1.0) * 0.3 +
         |    greatest(1.0 - (sym::DOUBLE /
         |      greatest(len(words), 1)::DOUBLE) * 2.0, 0.0) * 0.2 +
         |    greatest(1.0 - rep, 0.0) * 0.2, 6) AS quality_score,
         |  round(ns::DOUBLE / greatest(dl, 1)::DOUBLE, 6) AS script_nospace_fraction,
         |  round(CASE WHEN ns::DOUBLE / greatest(dl, 1)::DOUBLE >= 0.3
         |    THEN sym::DOUBLE / greatest(dl, 1)::DOUBLE
         |    ELSE sym::DOUBLE / greatest(len(words), 1)::DOUBLE END, 6)
         |    AS symbol_ratio_adaptive,
         |  round(CASE WHEN ns::DOUBLE / greatest(dl, 1)::DOUBLE >= 0.3
         |    THEN cover::DOUBLE / greatest(dl, 1)::DOUBLE
         |    ELSE stopn::DOUBLE / greatest(len(words), 1)::DOUBLE END, 6)
         |    AS stopword_fraction_adaptive,
         |  round(CASE WHEN ns::DOUBLE / greatest(dl, 1)::DOUBLE >= 0.3
         |    THEN c4 ELSE rep END, 6) AS repetition_adaptive
         |FROM w2""".stripMargin,

    "url_normalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE (doc_id % 4)
        |      WHEN 0 THEN 'HTTPS://Example' || (doc_id % 5)::VARCHAR ||
        |        '.COM:443/Path/' || doc_id::VARCHAR || '?utm_source=x&b=' ||
        |        (doc_id % 3)::VARCHAR || '&a=1&fbclid=zz#frag'
        |      WHEN 1 THEN 'http://WWW.Site' || (doc_id % 7)::VARCHAR || '.org:80'
        |      WHEN 2 THEN 'https://cdn.Host.net/a//b/' || doc_id::VARCHAR ||
        |        '?z=9&y=' || (doc_id % 2)::VARCHAR || '&utm_campaign=c'
        |      ELSE 'not a url ' || doc_id::VARCHAR
        |    END AS raw_url
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, raw_url,
        |    lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_replace(raw_url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
        |  FROM u),
        |n2 AS (
        |  SELECT *, lower(regexp_extract(rest, '^([^/?#]*)', 1)) AS auth0,
        |    regexp_replace(rest, '^[^/?#]*', '') AS after_auth FROM n),
        |n3 AS (
        |  SELECT *,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '')
        |         ELSE auth0 END AS auth,
        |    regexp_replace(after_auth, '#.*$', '') AS nofrag FROM n2),
        |n4 AS (
        |  SELECT *, regexp_extract(nofrag, '^([^?]*)', 1) AS path,
        |    regexp_extract(nofrag, '\?(.*)$', 1) AS query FROM n3),
        |n5 AS (
        |  SELECT *, coalesce(array_to_string(list_sort(list_filter(
        |      string_split(query, '&'),
        |      p -> p <> '' AND NOT regexp_matches(p,
        |        '^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$'))), '&'), '')
        |    AS sortedq
        |  FROM n4)
        |SELECT doc_id, raw_url,
        |  CASE WHEN NOT regexp_matches(raw_url, '^[A-Za-z][A-Za-z0-9+.-]*://')
        |    THEN raw_url
        |    ELSE scheme || '://' || auth ||
        |      (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |      (CASE WHEN sortedq = '' THEN '' ELSE '?' || sortedq END)
        |  END AS normalized_url
        |FROM n5""".stripMargin,

    // brute-force twin of semanticDedupIncremental on the same split:
    // corpus-derived cells, within-cell cosine edges among fresh docs
    // close transitively, a component with any fresh-corpus edge resolves
    // to its smallest linked corpus key, otherwise min-key wins
    "dedup_semantic_incremental" ->
      """WITH RECURSIVE
        |eall AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |fr AS (SELECT * FROM eall WHERE vec_id % 4 IN (1, 2)),
        |cp AS (SELECT * FROM eall WHERE vec_id % 4 NOT IN (1, 2)),
        |c AS (SELECT
        |        row_number() OVER (ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT ASC) - 1 AS cell,
        |        v AS cv
        |      FROM cp
        |      ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT ASC
        |      LIMIT 8),
        |af AS (SELECT vec_id, cell, v FROM (
        |    SELECT f.vec_id, c.cell, f.v,
        |      row_number() OVER (PARTITION BY f.vec_id
        |        ORDER BY list_dot_product(f.v, cv) /
        |          (sqrt(list_dot_product(f.v, f.v)) * sqrt(list_dot_product(cv, cv))) DESC,
        |          c.cell ASC) AS rk
        |    FROM fr f CROSS JOIN c) WHERE rk = 1),
        |ac AS (SELECT vec_id, cell, v FROM (
        |    SELECT p.vec_id, c.cell, p.v,
        |      row_number() OVER (PARTITION BY p.vec_id
        |        ORDER BY list_dot_product(p.v, cv) /
        |          (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(cv, cv))) DESC,
        |          c.cell ASC) AS rk
        |    FROM cp p CROSS JOIN c) WHERE rk = 1),
        |edges0 AS (
        |  SELECT a.vec_id AS key_a, b.vec_id AS key_b
        |  FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35),
        |sym AS (SELECT key_a AS a, key_b AS b FROM edges0
        |        UNION SELECT key_b, key_a FROM edges0),
        |cc AS (SELECT a AS node, a AS lbl FROM sym
        |       UNION SELECT e.b, cc.lbl FROM cc JOIN sym e ON e.a = cc.node),
        |m AS (SELECT node, min(lbl) AS lbl FROM cc GROUP BY node),
        |comp AS (SELECT fr.vec_id, coalesce(m.lbl, fr.vec_id) AS cluster_id
        |         FROM fr LEFT JOIN m ON m.node = fr.vec_id),
        |crosse AS (
        |  SELECT a.vec_id AS fk, b.vec_id AS ck
        |  FROM af a JOIN ac b ON a.cell = b.cell
        |  WHERE list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35),
        |clc AS (SELECT comp.cluster_id, min(crosse.ck) AS corpus_dup
        |        FROM crosse JOIN comp ON comp.vec_id = crosse.fk
        |        GROUP BY 1)
        |SELECT comp.vec_id,
        |  (comp.cluster_id = comp.vec_id AND clc.corpus_dup IS NULL) AS keep,
        |  coalesce(clc.corpus_dup,
        |    CASE WHEN comp.cluster_id <> comp.vec_id THEN comp.cluster_id END,
        |    comp.vec_id) AS resolved_to
        |FROM comp LEFT JOIN clc ON clc.cluster_id = comp.cluster_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |      x -> length(x) > 0)) AS ws_tokens,
        |  len(regexp_extract_all(coalesce(text, ''),
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS regex_tokens,
        |  len(regexp_extract_all(coalesce(text, ''),
        |      '''(s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\r\f\p{L}\p{N}]+'))
        |    AS bpe_tokens
        |FROM documents""".stripMargin,

    // rolling hash re-derived in SQL: base-31 polynomial mod 1e9+7
    "text_fingerprint" ->
      """SELECT doc_id, md5(coalesce(text, '')) AS fingerprint,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(range(1, length(coalesce(text, '')) + 1),
        |      i -> ascii(coalesce(text, '')[i])::BIGINT)),
        |    (acc, c) -> (acc * 31 + c) % 1000000007)
        |    AS rolling_hash
        |FROM documents""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, md5(coalesce(text, '')) AS fingerprint,
        |  row_number() OVER (PARTITION BY md5(coalesce(text, ''))
        |                     ORDER BY doc_id ASC) > 1 AS is_dup
        |FROM documents""".stripMargin,

    "dedup_jaccard_pairs" ->
      s"""WITH d AS (SELECT doc_id, $docShingles AS shs FROM documents)
         |SELECT a.doc_id AS key_a, b.doc_id AS key_b,
         |  round(len(list_filter(a.shs, x -> list_contains(b.shs, x)))::DOUBLE /
         |    (len(a.shs) + len(b.shs) -
         |     len(list_filter(a.shs, x -> list_contains(b.shs, x))))::DOUBLE, 6)
         |  AS jaccard
         |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1""".stripMargin,

    // dup graph = exact-dup links + exactly-verified near pairs among
    // distinct-text representatives; brute-forced via an inverted index
    // (any pair with jaccard >= 0.5 shares >= 1 shingle, so the inverted
    // join loses nothing vs all-pairs)
    "dedup_minhash_lsh" ->
      s"""WITH $minhashGraphCtes
         |SELECT key_a, key_b,
         |  round(inter::DOUBLE / (na + nb - inter)::DOUBLE, 6) AS jaccard
         |FROM pairs WHERE inter::DOUBLE / (na + nb - inter)::DOUBLE >= 0.5
         |UNION ALL SELECT * FROM links""".stripMargin,

    // transitive closure of the dup graph in recursive SQL (tiny oracle
    // corpus): min reachable key per node = the cluster id hash-min
    // label propagation converges to
    "dedup_clusters" -> dedupClustersSql,

    // the stage-checkpointed DAG must land on the SAME decisions as the
    // one-shot pipeline — identical oracle, separately executed path
    "dedup_resumable" -> dedupClustersSql,

    // snapshot-over-corpus incremental dedup, brute-forced with corpus
    // priority (see dedupIncrementalSql scaladoc)
    "dedup_incremental" -> dedupIncrementalSql,

    // brute-force simhash in SQL: FNV-1a 64 over each word's UTF-16 units
    // (HUGEINT arithmetic mod 2^64 reproduces JVM long wraparound exactly;
    // the corpus is ASCII so unicode() == UTF-16 unit), majority-vote sign
    // bits, then all-pairs hamming among representatives
    "dedup_simhash" ->
      s"""WITH fp AS (SELECT doc_id, coalesce(text, '') AS text,
         |              md5(coalesce(text, '')) AS f FROM documents),
         |g AS (SELECT f, min(doc_id) AS rep FROM fp GROUP BY f),
         |links AS (SELECT g.rep AS key_a, fp.doc_id AS key_b,
         |            0::BIGINT AS hamming
         |          FROM fp JOIN g USING (f) WHERE fp.doc_id <> g.rep),
         |reps AS (SELECT fp.doc_id, fp.text FROM fp JOIN g
         |         ON fp.f = g.f AND fp.doc_id = g.rep),
         |wrd AS (SELECT doc_id,
         |        list_filter(string_split_regex(text, '\\s+'),
         |                    x -> length(x) > 0) AS words FROM reps),
         |hsh AS (SELECT doc_id, list_transform(words, wd ->
         |        list_reduce(
         |          list_prepend(14695981039346656037::HUGEINT,
         |            list_transform(range(1, length(wd) + 1),
         |                           i -> unicode(wd[i])::HUGEINT)),
         |          (h, c) -> ((h - (h % 65536) +
         |              xor((h % 65536)::BIGINT, c::BIGINT)::HUGEINT)
         |            * 1099511628211::HUGEINT)
         |            % 18446744073709551616::HUGEINT)) AS hs FROM wrd),
         |sg AS (SELECT doc_id, list_transform(range(0, 64), b ->
         |        CASE WHEN 2 * len(list_filter(hs,
         |          x -> (x // (1::HUGEINT << b)) % 2 = 1)) > len(hs)
         |        THEN 1 ELSE 0 END) AS bits FROM hsh),
         |pairs AS (
         |  SELECT a.doc_id AS key_a, b.doc_id AS key_b,
         |    len(list_filter(range(1, 65), i -> a.bits[i] <> b.bits[i]))::BIGINT
         |      AS hamming
         |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id)
         |SELECT key_a, key_b, hamming FROM pairs WHERE hamming <= 3
         |UNION ALL SELECT * FROM links""".stripMargin,

    "ann_topk" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_dot_product(embedding::DOUBLE[], qv) /
        |    (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(qv, qv))), 6) AS score
        |FROM embeddings, q
        |ORDER BY list_dot_product(embedding::DOUBLE[], qv) /
        |  (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
        |   sqrt(list_dot_product(qv, qv))) DESC, vec_id ASC
        |LIMIT 10""".stripMargin,

    // multi-probe sign-LSH re-derived in SQL: the +/-1 hyperplane matrix
    // comes from md5("j,i") — identical to Similarity.planeSigns — then
    // query bucket + 2 lowest-margin bit flips are probed
    "ann_lsh" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |dims AS (SELECT len(qv) AS nd FROM q),
        |planes AS (
        |  SELECT j, list_transform(range(0, nd), i ->
        |    CASE WHEN ('0x' || substr(md5(j::VARCHAR || ',' || i::VARCHAR), 1, 15))::BIGINT % 2 = 0
        |         THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END) AS pvec
        |  FROM range(0, 4) t(j), dims),
        |qd AS (SELECT j, list_dot_product(qv, pvec) AS d FROM planes, q),
        |qb AS (SELECT sum(CASE WHEN d >= 0 THEN (1 << j) ELSE 0 END)::BIGINT AS b FROM qd),
        |flips AS (SELECT j FROM qd ORDER BY abs(d) ASC, j ASC LIMIT 2),
        |probes AS (SELECT b FROM qb
        |           UNION ALL SELECT xor(qb.b, (1 << j)::BIGINT) FROM qb, flips),
        |vb AS (SELECT vec_id,
        |         sum(CASE WHEN list_dot_product(embedding::DOUBLE[], pvec) >= 0
        |             THEN (1 << j) ELSE 0 END)::BIGINT AS b
        |       FROM embeddings, planes GROUP BY vec_id)
        |SELECT e.vec_id,
        |  round(list_dot_product(e.embedding::DOUBLE[], qv) /
        |    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(qv, qv))), 6) AS score
        |FROM embeddings e JOIN vb USING (vec_id), q
        |WHERE vb.b IN (SELECT b FROM probes)
        |ORDER BY list_dot_product(e.embedding::DOUBLE[], qv) /
        |  (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |   sqrt(list_dot_product(qv, qv))) DESC, e.vec_id ASC
        |LIMIT 10""".stripMargin,

    // IVF re-derived in SQL: centroids = 8 smallest md5(vec_id) rows in
    // hash order (cell = rank), assignment = first max-cosine cell,
    // probes = top-3 cells by query cosine — identical tie-breaks to
    // Similarity.ivfIndex/ivfTopK
    "ann_ivf" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT
        |        row_number() OVER (ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT ASC) - 1 AS cell,
        |        embedding::DOUBLE[] AS cv
        |      FROM embeddings
        |      ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT ASC
        |      LIMIT 8),
        |probe AS (SELECT cell FROM c, q
        |          ORDER BY list_dot_product(cv, qv) /
        |            (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))) DESC,
        |            cell ASC LIMIT 3),
        |assign AS (
        |  SELECT e.vec_id, c.cell,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_dot_product(e.embedding::DOUBLE[], cv) /
        |        (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |         sqrt(list_dot_product(cv, cv))) DESC, c.cell ASC) AS rk
        |  FROM embeddings e CROSS JOIN c),
        |hits AS (SELECT vec_id FROM assign
        |         WHERE rk = 1 AND cell IN (SELECT cell FROM probe))
        |SELECT e.vec_id,
        |  round(list_dot_product(e.embedding::DOUBLE[], qv) /
        |    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(qv, qv))), 6) AS score
        |FROM embeddings e JOIN hits USING (vec_id), q
        |ORDER BY list_dot_product(e.embedding::DOUBLE[], qv) /
        |  (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |   sqrt(list_dot_product(qv, qv))) DESC, e.vec_id ASC
        |LIMIT 10""".stripMargin,

    "emb_cosine_pairs" ->
      """SELECT a.vec_id AS key_a, b.vec_id AS key_b,
        |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
        |  AS cosine
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""".stripMargin,

    // same deterministic cells as ann_ivf (md5-strided centroid sample,
    // first-maximal tie-break), within-cell cosine edges, recursive-SQL
    // transitive closure, min-key representative per component
    "dedup_semantic" ->
      """WITH RECURSIVE
        |c AS (SELECT
        |        row_number() OVER (ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT ASC) - 1 AS cell,
        |        embedding::DOUBLE[] AS cv
        |      FROM embeddings
        |      ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT ASC
        |      LIMIT 8),
        |assign AS (
        |  SELECT e.vec_id, c.cell, e.embedding::DOUBLE[] AS v,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_dot_product(e.embedding::DOUBLE[], cv) /
        |        (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |         sqrt(list_dot_product(cv, cv))) DESC, c.cell ASC) AS rk
        |  FROM embeddings e CROSS JOIN c),
        |a2 AS (SELECT vec_id, cell, v FROM assign WHERE rk = 1),
        |edges0 AS (
        |  SELECT a.vec_id AS key_a, b.vec_id AS key_b
        |  FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35),
        |sym AS (SELECT key_a AS a, key_b AS b FROM edges0
        |        UNION SELECT key_b, key_a FROM edges0),
        |cc AS (SELECT a AS node, a AS lbl FROM sym
        |       UNION SELECT e.b, cc.lbl FROM cc JOIN sym e ON e.a = cc.node),
        |m AS (SELECT node, min(lbl) AS lbl FROM cc GROUP BY node)
        |SELECT vec_id, coalesce(m.lbl, vec_id) AS cluster_id,
        |  coalesce(m.lbl, vec_id) = vec_id AS keep
        |FROM embeddings LEFT JOIN m ON m.node = vec_id""".stripMargin,

    "scrub_pii" ->
      s"""WITH $pagesCte
         |SELECT url,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |  regexp_replace(regexp_replace(coalesce(text, ''),
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\b(?:\\d{4}[ -]){3}\\d{4}\\b', '<CC>', 'g'),
         |    '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
         |    '(?:\\+?1[ .-])?(?:\\(\\d{3}\\)[ .-]?|\\b\\d{3}[ .-])\\d{3}[ .-]\\d{4}\\b', '<PHONE>', 'g'),
         |    '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
         |    '(?i)\\b(?:${graft.functions.Scrub.toxicityWords.mkString("|")})\\b', '<TOX>', 'g') AS scrubbed_text
         |FROM pages""".stripMargin,

    "pipeline_verdict" ->
      s"""WITH v AS ($pipelineVerdictSql)
         |SELECT url, keep,
         |  coalesce(array_to_string(fail_reasons, '|'), '') AS fail_reasons,
         |  quality_score
         |FROM v""".stripMargin,

    "pipeline_host_stats" ->
      s"""WITH v AS ($pipelineVerdictSql)
         |SELECT regexp_extract(url, 'https?://([^/]+)/', 1) AS host,
         |  count(*) AS doc_count,
         |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS keep_count,
         |  round(sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE /
         |    count(*)::DOUBLE, 6) AS keep_rate
         |FROM v GROUP BY 1""".stripMargin,

    // per-url-bucket lineage metrics: DuckDB re-derives the md5 bucket,
    // per-rule fail counts from fail_reasons, and the sha256 check_id
    "pipeline_full" -> {
      val rules = QualityFilter.heuristicRules.map(_.name)
      s"""WITH v AS ($pipelineVerdictSql),
         |b AS (
         |  SELECT ${Pages.urlBucketSql("url", 32)} AS url_bucket,
         |    keep, fail_reasons FROM v),
         |agg AS (
         |  SELECT url_bucket, count(*) AS doc_count,
         |    sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS pass_count,
         |    ${rules.zipWithIndex.map { case (r, i) =>
               s"sum(CASE WHEN list_contains(fail_reasons, '$r') THEN 1 ELSE 0 END)::BIGINT AS f$i"
             }.mkString(",\n    ")}
         |  FROM b GROUP BY 1),
         |st AS (
         |  ${rules.zipWithIndex.map { case (r, i) =>
               s"SELECT url_bucket, doc_count, pass_count, '$r' AS name, f$i AS actual_value FROM agg"
             }.mkString("\n  UNION ALL\n  ")})
         |SELECT sha256('pages' || name || url_bucket::VARCHAR) AS check_id,
         |  name, url_bucket, actual_value, doc_count,
         |  pass_count, doc_count - pass_count AS fail_count,
         |  actual_value = 0 AS success, actual_value <> 0 AS fail
         |FROM st""".stripMargin
    },

    "dedup_ngram_inverted" ->
      s"""WITH d AS (SELECT doc_id, $docShingles AS shs FROM documents),
         |docs AS (SELECT doc_id, len(shs) AS n_sh, shs FROM d),
         |inv AS (SELECT doc_id, n_sh, unnest(shs) AS sh FROM docs),
         |dfreq AS (SELECT sh FROM inv GROUP BY sh HAVING count(*) <= 1000),
         |pruned AS (SELECT i.* FROM inv i JOIN dfreq USING (sh)),
         |pairs AS (
         |  SELECT a.doc_id AS key_a, b.doc_id AS key_b,
         |         a.n_sh AS na, b.n_sh AS nb, count(*) AS inter
         |  FROM pruned a JOIN pruned b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT key_a, key_b,
         |  inter::DOUBLE / (na + nb - inter)::DOUBLE AS jaccard
         |FROM pairs
         |WHERE inter::DOUBLE / (na + nb - inter)::DOUBLE >= 0.5""".stripMargin,

    // shingles() dedups per document, so count(*) after the bench probe
    // is the distinct-overlap count on both engines
    "decontaminate" ->
      s"""WITH d AS (SELECT doc_id, $docShingles AS shs FROM documents),
         |bench AS (SELECT DISTINCT unnest(shs) AS gram FROM d
         |          WHERE doc_id % 50 = 0),
         |dg AS (SELECT doc_id, unnest(shs) AS gram FROM d),
         |ov AS (SELECT dg.doc_id, count(*)::BIGINT AS overlap_count
         |       FROM dg JOIN bench USING (gram) GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(ov.overlap_count, 0)::BIGINT AS overlap_count,
         |  coalesce(ov.overlap_count, 0) > 0 AS contaminated
         |FROM d LEFT JOIN ov USING (doc_id)""".stripMargin,

    // keep iff (first 32 md5 bits of the key)/2^32 < min(1, 2000/total):
    // hash32/2^32 is exact in a double and 2000.0/total is the same IEEE
    // division of the same integers Spark performs, so the boolean is
    // bit-deterministic across engines
    "sample_budget" ->
      s"""WITH d AS (SELECT doc_id, coalesce(lang, '') AS stratum,
         |             len($docWords)::BIGINT AS token_count FROM documents),
         |tot AS (SELECT stratum, sum(token_count)::BIGINT AS stratum_tokens
         |        FROM d GROUP BY 1),
         |h AS (SELECT d.*, tot.stratum_tokens,
         |        list_reduce(list_prepend(0::BIGINT,
         |          list_transform(range(1, 9), i ->
         |            (strpos('0123456789abcdef',
         |                    md5(d.doc_id::VARCHAR)[i:i]) - 1)::BIGINT)),
         |          (acc, v) -> acc * 16 + v) AS h32
         |      FROM d JOIN tot USING (stratum))
         |SELECT doc_id, stratum, token_count,
         |  (h32::DOUBLE / 4294967296.0) <
         |    least(1.0, 2000.0 / stratum_tokens::DOUBLE) AS sampled
         |FROM h""".stripMargin,

    // same deterministic boilerplate wrap, then: per-line doc frequency
    // (distinct per doc), drop lines over the cap, reassemble in order
    "lines_dedup" ->
      s"""WITH t AS (SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0
         |       THEN 'NAV MENU HOME ABOUT CONTACT' || chr(10) ||
         |            coalesce(text, '') || chr(10) ||
         |            'COPYRIGHT 2024 EXAMPLE INC ALL RIGHTS RESERVED'
         |       ELSE coalesce(text, '') END AS text FROM documents),
         |ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM t),
         |l AS (SELECT doc_id, unnest(list_transform(
         |        range(1, len(arr) + 1),
         |        i -> {'pos': i, 'line': arr[i]}), recursive := true)
         |      FROM ls),
         |heavy AS (SELECT line FROM (SELECT DISTINCT doc_id, line FROM l)
         |          GROUP BY line HAVING count(*) > 10),
         |kept AS (SELECT l.doc_id, l.pos, l.line FROM l
         |         WHERE NOT EXISTS (SELECT 1 FROM heavy h
         |                           WHERE h.line = l.line)),
         |agg AS (SELECT doc_id,
         |          string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         |          count(*)::BIGINT AS kept_lines
         |        FROM kept GROUP BY doc_id)
         |SELECT ls.doc_id, coalesce(agg.clean_text, '') AS clean_text,
         |  len(ls.arr)::BIGINT AS n_lines,
         |  len(ls.arr)::BIGINT - coalesce(agg.kept_lines, 0) AS removed_lines
         |FROM ls LEFT JOIN agg USING (doc_id)""".stripMargin,

    // same md5 bucket/order, same cumulative window sum (cast from
    // DuckDB's HUGEINT), same integer chunk arithmetic
    "pack_sequences" ->
      s"""WITH d AS (SELECT doc_id, len($docWords)::BIGINT AS token_count,
         |             md5(doc_id::VARCHAR) AS h FROM documents),
         |b AS (SELECT *, ('0x' || substr(h, 1, 15))::BIGINT % 8 AS bucket
         |      FROM d),
         |w AS (SELECT doc_id, bucket, token_count,
         |        (sum(token_count) OVER (PARTITION BY bucket ORDER BY h
         |           ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM b)
         |SELECT doc_id, bucket, token_count,
         |  cum - token_count AS start_offset,
         |  (cum - token_count) // 512 AS seq_index,
         |  (token_count > 0 AND
         |   ((cum - 1) // 512) != ((cum - token_count) // 512))
         |    AS spans_boundary
         |FROM w""".stripMargin,

    // window hashes re-derived as md5 over the same ' '-joined word
    // slices; duplicated = distinct-doc frequency >= 2; covered token
    // positions unioned per doc; rebuild = ordered string_agg
    "dedup_substring" ->
      s"""WITH d AS (SELECT doc_id, $docWords AS w FROM documents),
         |win AS (SELECT doc_id, unnest(list_transform(
         |          range(0, greatest(len(w) - 14, 0)),
         |          i -> {'s': i, 'h': md5(array_to_string(w[i+1:i+15], ' '))}),
         |        recursive := true) FROM d),
         |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM win)
         |        GROUP BY h HAVING count(*) >= 2),
         |cov AS (SELECT DISTINCT doc_id, unnest(range(s, s + 15)) AS p
         |        FROM win JOIN dup USING (h)),
         |tok AS (SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
         |          i -> {'p': i - 1, 'word': w[i]}), recursive := true)
         |        FROM d),
         |kept AS (SELECT t.doc_id, t.p, t.word FROM tok t
         |         WHERE NOT EXISTS (SELECT 1 FROM cov c
         |                           WHERE c.doc_id = t.doc_id AND c.p = t.p)),
         |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY p) AS clean_text,
         |          count(*)::BIGINT AS kept_tokens
         |        FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(agg.clean_text, '') AS clean_text,
         |  len(d.w)::BIGINT AS n_tokens,
         |  len(d.w)::BIGINT - coalesce(agg.kept_tokens, 0) AS removed_tokens
         |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin,

    // same rule set over the same pages CTE; keep iff no reason fires,
    // host-cap keep = (first 32 md5 bits of url)/2^32 < min(1, 18/n) —
    // the same IEEE comparison of the same integers Spark performs
    "url_filter" ->
      s"""WITH $pagesCte,
         |m AS (SELECT url,
         |        lower(regexp_extract(url,
         |          '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS host,
         |        contains(lower(url), 'doc/13') AS banned
         |      FROM pages),
         |b AS (SELECT *, (host = 'src3.example.com'
         |                 OR host LIKE '%.src3.example.com') AS blocked
         |      FROM m),
         |c AS (SELECT host, count(*)::BIGINT AS n FROM b
         |      WHERE NOT blocked AND NOT banned GROUP BY 1),
         |r AS (SELECT b.url, b.host, coalesce(c.n, 0)::BIGINT AS n_host_docs,
         |        CASE WHEN b.blocked THEN 'blocked_host'
         |             WHEN b.banned THEN 'banned_url_pattern'
         |             WHEN NOT ((('0x' || substr(md5(b.url), 1, 8))::BIGINT::DOUBLE
         |                        / 4294967296.0)
         |                       < least(1.0, 18.0 / c.n::DOUBLE))
         |               THEN 'host_cap'
         |             ELSE '' END AS reason
         |      FROM b LEFT JOIN c USING (host))
         |SELECT url, host, n_host_docs, reason = '' AS keep, reason
         |FROM r""".stripMargin,


    "multimodal_meta" ->
      s"""WITH $pagesCte
         |SELECT url,
         |  octet_length(encode('<html><body>' || text || '</body></html>'))::BIGINT
         |    AS media_bytes,
         |  'html' AS media_format
         |FROM pages""".stripMargin,

    // re-derives the synthesized WAV header fields the RIFF parser must
    // recover (data_bytes = frames*channels*2 for 16-bit PCM; duration =
    // data_bytes / (rate*channels*2) seconds)
    "multimodal_audio" ->
      """SELECT doc_id,
        |  (8000 + (doc_id % 5) * 1000)::INT AS sample_rate,
        |  (1 + (doc_id % 2))::INT AS channels,
        |  16::INT AS bits_per_sample,
        |  ((100 + (doc_id % 50)) * (1 + (doc_id % 2)) * 2)::BIGINT AS data_bytes,
        |  ((100 + (doc_id % 50)) * (1 + (doc_id % 2)) * 2 * 1000)::DOUBLE /
        |    ((8000 + (doc_id % 5) * 1000) * (1 + (doc_id % 2)) * 2)::DOUBLE
        |    AS duration_ms
        |FROM documents""".stripMargin,

    // re-derives the decoded-frame statistics from the synthAviRgb pixel
    // formula (R/G/B at frame f, pixel x, y) — the Spark side must walk
    // the actual DIB byte layout (bottom-up padded rows) to recover the
    // same integers; a decode bug (row order, stride, channel order read
    // back wrong) changes the sums. Sampled frames are 0 and 4 (stride 4,
    // 5-8 frames per doc); mean = sum(r+g+b) // (3*w*h), exact integer
    // arithmetic on both engines.
    "multimodal_video" ->
      """WITH params AS (
        |  SELECT doc_id,
        |    (5 + (doc_id % 3) * 2)::INT AS w,
        |    (4 + (doc_id % 3))::INT AS h,
        |    (5 + (doc_id % 4)) AS nf
        |  FROM documents),
        |sampled AS (
        |  SELECT doc_id, w, h, nf, t.f
        |  FROM params, (SELECT unnest([0, 4]) AS f) t
        |  WHERE t.f < nf),
        |means AS (
        |  SELECT s.doc_id, s.f,
        |    sum((s.f*17 + x.x*5 + y.y*29) % 256 +
        |        (s.f*59 + x.x*11 + y.y*3) % 256 +
        |        (s.f*131 + x.x*7 + y.y*13) % 256) // (3 * s.w * s.h) AS m
        |  FROM sampled s, range(9) x(x), range(6) y(y)
        |  WHERE x.x < s.w AND y.y < s.h
        |  GROUP BY s.doc_id, s.f, s.w, s.h),
        |agg AS (
        |  SELECT doc_id, array_to_string(list(m ORDER BY f), '|') AS fm
        |  FROM means GROUP BY doc_id)
        |SELECT p.doc_id, p.w AS width, p.h AS height,
        |  p.nf::BIGINT AS total_frames,
        |  (p.nf * 40.0)::DOUBLE AS duration_ms,
        |  agg.fm AS frame_means
        |FROM params p JOIN agg USING (doc_id)""".stripMargin
  )
}
