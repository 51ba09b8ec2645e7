package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full production corpus job, end-to-end and restart-safe:
  *
  *   url rules (stateless + broadcast over-cap hosts, optional) — stage 0
  *   quality filter (bucketed, resumable)        -> <outDir>/verdicts
  *   trained-classifier gate (optional)          — scrubbed-text scoring
  *   near-dup dedup of the survivors (stage DAG) -> <outDir>/dedup_stages
  *   final corpus (all gates ∩ dedup-keep)       -> <outDir>/corpus
  *
  * Every phase reuses its own commit protocol — per-bucket `_SUCCESS` +
  * `_METRICS_OK` for the filter ([[Resume.runBucketed]]), per-stage
  * atomic parquet commits for dedup ([[Dedup.dedupResumable]]), and one
  * atomic parquet job for the corpus — so a kill anywhere restarts at
  * the exact uncommitted unit, never reprocessing committed work. All
  * phases are deterministic functions of the input, so a resumed run's
  * corpus is byte-identical to an uninterrupted one (PipelineFullSpec).
  *
  * Dedup runs on the SCRUBBED text of quality keepers: scrubbing is
  * byte-deterministic, dropping the quality failures first shrinks the
  * dedup input (typically the majority of a web crawl fails quality),
  * and the corpus content being deduplicated is exactly what ships.
  */
object Pipeline {

  final case class Report(pages: Long, qualityKept: Long, dupDropped: Long,
                          corpusDocs: Long, bucketsRun: Int,
                          bucketsSkipped: Int,
                          dedupStages: Dedup.ResumeReport,
                          corpusRecomputed: Boolean) {
    /** Docs the heuristic rules kept but the trained classifier gate
      * dropped (0 when the gate is off). Derived, not counted: dedup
      * decisions carry one row per gate survivor, so the identity
      * kept = modelDropped + dupDropped + corpusDocs closes exactly —
      * no extra action for the report.
      */
    def modelDropped: Long = qualityKept - dupDropped - corpusDocs
    def json: String =
      s"""{"pages":$pages,"quality_kept":$qualityKept,""" +
        s""""model_dropped":$modelDropped,""" +
        s""""dup_dropped":$dupDropped,"corpus_docs":$corpusDocs,""" +
        s""""buckets_run":$bucketsRun,"buckets_skipped":$bucketsSkipped,""" +
        s""""dedup_stages_run":[${dedupStages.ran.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""dedup_stages_resumed":[${dedupStages.skipped.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""corpus_recomputed":$corpusRecomputed}"""
  }

  def runFull(spark: SparkSession, pages: DataFrame, outDir: String,
              metricsDir: String, runId: String, buckets: Int = 64,
              jaccardThreshold: Double = 0.8,
              rules: Seq[RowRule] = QualityFilter.defaultRules,
              failAfterBuckets: Int = Int.MaxValue,
              failAfterDedupStages: Int = Int.MaxValue,
              blockedHosts: Seq[String] = Nil,
              bannedUrlParts: Seq[String] = Nil,
              maxDocsPerHost: Long = Long.MaxValue,
              minQualityProb: Option[Double] = None): Report = {
    // stage 0 (optional): url-level drops before any text is parsed.
    // Pure function of the input urls, so the bucket commit protocol
    // below sees the same filtered set on every restart — resume safety
    // is unaffected. Report counts are relative to the url-kept set.
    val inPages =
      if (blockedHosts.isEmpty && bannedUrlParts.isEmpty &&
        maxDocsPerHost == Long.MaxValue) pages
      else Curation.applyUrlRules(pages, "url", blockedHosts,
        bannedUrlParts, maxDocsPerHost)
    val (ran, skipped) = Resume.runBucketed(spark, inPages,
      s"$outDir/verdicts", metricsDir, runId, buckets,
      failAfter = failAfterBuckets, rules = rules)
    val verdicts = spark.read.parquet(s"$outDir/verdicts")
    val keptVerdicts = verdicts.filter(col("keep"))
    // optional trained-classifier gate ([[graft.functions.QualityModel]],
    // the GPT-3-style "score against a curated reference corpus" filter):
    // scored on the SCRUBBED text (the pipeline's real order — the model
    // treats scrub placeholders as prose artifacts), applied between the
    // heuristic filter and dedup so dedup only pays for survivors.
    // Deterministic function of the committed verdicts, so bucket resume
    // is unaffected; the threshold rides into dedup's _PARAMS record via
    // inputTag, so changing it against a stale dedup_stages dir fails
    // loudly instead of silently reusing stages from the old policy.
    val dedupInput = minQualityProb match {
      case Some(p) =>
        graft.functions.ModelScores
          .withQualityScore(
            keptVerdicts.select(col("url"), col("scrubbed_text")),
            "scrubbed_text")
          .filter(col("quality_prob") >= p)
          .select(col("url"), col("scrubbed_text"))
      case None => keptVerdicts.select(col("url"), col("scrubbed_text"))
    }
    val (decisions, dedupReport) = Dedup.dedupResumable(
      dedupInput, "url",
      "scrubbed_text", s"$outDir/dedup_stages",
      jaccardThreshold = jaccardThreshold,
      failAfter = failAfterDedupStages,
      inputTag = minQualityProb.fold("")(p => s"minQualityProb=$p"))
    val corpusPath = s"$outDir/corpus"
    val corpusCommitted = graft.sources.Fs.exists(s"$corpusPath/_SUCCESS")
    if (!corpusCommitted) {
      // left-semi on the dedup survivors: the corpus carries the full
      // verdict row (scrubbed text, lang, scores, lineage columns), only
      // for documents that passed quality AND are their cluster's keeper
      keptVerdicts
        .join(decisions.filter(col("keep")).select(col("url")),
          Seq("url"), "left_semi")
        .write.mode("overwrite").parquet(corpusPath)
    }
    // ONE action for all four report counts (round-5 verdict: the old
    // shape spent four extra full scans — pages.count, kept.count, a
    // drop-count over decisions and a re-read of the corpus — purely for
    // the JSON report; at 10^12 documents that is real money). verdicts
    // has exactly one row per input page (runBucketed partitions pages by
    // url bucket and writes each exactly once, PipelineFullSpec), and
    // decisions has one row per quality keeper, so the corpus size is the
    // decisions keep-count — the commit protocol makes the written corpus
    // deterministic, so no re-read is needed. Two 1-row aggregates
    // cross-joined = one job over two column-pruned parquet scans.
    val c = verdicts
      .agg(count(lit(1)).as("pages"),
        coalesce(count_if(col("keep")), lit(0L)).as("kept"))
      .crossJoin(decisions.agg(
        coalesce(count_if(!col("keep")), lit(0L)).as("dropped"),
        coalesce(count_if(col("keep")), lit(0L)).as("corpus")))
      .head()
    Report(
      pages = c.getAs[Long]("pages"),
      qualityKept = c.getAs[Long]("kept"),
      dupDropped = c.getAs[Long]("dropped"),
      corpusDocs = c.getAs[Long]("corpus"),
      bucketsRun = ran, bucketsSkipped = skipped,
      dedupStages = dedupReport,
      corpusRecomputed = !corpusCommitted)
  }
}
