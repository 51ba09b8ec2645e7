package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full production corpus job, end-to-end and restart-safe:
  *
  *   quality filter (bucketed, resumable)        -> <outDir>/verdicts
  *   near-dup dedup of the keepers (stage DAG)   -> <outDir>/dedup_stages
  *   final corpus (quality-keep ∩ dedup-keep)    -> <outDir>/corpus
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
    def json: String =
      s"""{"pages":$pages,"quality_kept":$qualityKept,""" +
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
              failAfterDedupStages: Int = Int.MaxValue): Report = {
    val (ran, skipped) = Resume.runBucketed(spark, pages,
      s"$outDir/verdicts", metricsDir, runId, buckets,
      failAfter = failAfterBuckets, rules = rules)
    val verdicts = spark.read.parquet(s"$outDir/verdicts")
    val kept = verdicts.filter(col("keep"))
      .select(col("url"), col("scrubbed_text"))
    val (decisions, dedupReport) = Dedup.dedupResumable(kept, "url",
      "scrubbed_text", s"$outDir/dedup_stages",
      jaccardThreshold = jaccardThreshold,
      failAfter = failAfterDedupStages)
    val corpusPath = s"$outDir/corpus"
    val corpusCommitted = new java.io.File(s"$corpusPath/_SUCCESS").exists()
    if (!corpusCommitted) {
      // left-semi on the dedup survivors: the corpus carries the full
      // verdict row (scrubbed text, lang, scores, lineage columns), only
      // for documents that passed quality AND are their cluster's keeper
      verdicts.filter(col("keep"))
        .join(decisions.filter(col("keep")).select(col("url")),
          Seq("url"), "left_semi")
        .write.mode("overwrite").parquet(corpusPath)
    }
    Report(
      pages = pages.count(),
      qualityKept = kept.count(),
      dupDropped = decisions.filter(!col("keep")).count(),
      corpusDocs = spark.read.parquet(corpusPath).count(),
      bucketsRun = ran, bucketsSkipped = skipped,
      dedupStages = dedupReport,
      corpusRecomputed = !corpusCommitted)
  }
}
