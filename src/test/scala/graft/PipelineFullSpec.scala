package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Pipeline}

/** End-to-end corpus job (operators/Pipeline): filter -> dedup -> corpus,
  * restart-safe at every commit unit.
  */
class PipelineFullSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("full pipeline: counts are consistent and the corpus is exactly " +
    "quality-keep AND dedup-keep") {
    val pages = graft.sources.Pages.load(spark, dir)
    val out = tmp("pipefull")
    val r = Pipeline.runFull(spark, pages, out, s"$out/metrics", "pf1",
      buckets = 4, jaccardThreshold = 0.5)
    assert(r.pages == 500)
    assert(r.bucketsRun == 4 && r.bucketsSkipped == 0)
    assert(r.dedupStages.ran ==
      Seq("reps", "links", "cand", "pairs", "decisions"))
    assert(r.corpusRecomputed)
    // every dedup drop is a quality keeper, so the counts close exactly
    assert(r.corpusDocs == r.qualityKept - r.dupDropped)
    assert(r.corpusDocs > 0 && r.corpusDocs < r.pages)
    // corpus rows ARE verdict rows (schema + content subset)
    val corpus = spark.read.parquet(s"$out/corpus")
    val verdicts = spark.read.parquet(s"$out/verdicts")
    assert(corpus.columns.sorted.toSeq == verdicts.columns.sorted.toSeq)
    assert(corpus.filter(!col("keep")).count() == 0)

    // idempotent rerun: nothing recomputed, identical corpus — and the
    // JSON report costs exactly ONE action (round-6 fix: the old shape
    // ran four extra scans purely for the report; on a fully-committed
    // rerun the report is the only query execution left, so the listener
    // count pins it)
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = actions.incrementAndGet()
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val r2 =
      try {
        val res = Pipeline.runFull(spark, pages, out, s"$out/metrics", "pf1",
          buckets = 4, jaccardThreshold = 0.5)
        // listener events are posted async: poll until the count is stable
        var last = -1
        var waited = 0
        while (actions.get != last && waited < 5000) {
          last = actions.get
          Thread.sleep(250); waited += 250
        }
        res
      } finally spark.listenerManager.unregister(listener)
    assert(actions.get == 1,
      s"expected the report to be the only action on a committed rerun, " +
        s"saw ${actions.get}")
    assert(r2.bucketsRun == 0 && r2.bucketsSkipped == 4)
    assert(r2.dedupStages.ran.isEmpty && r2.dedupStages.skipped.size == 5)
    assert(!r2.corpusRecomputed)
    assert(r2.corpusDocs == r.corpusDocs)
  }

  test("stage 0 url rules: blocked host and over-cap drops never reach " +
    "the quality filter, and the corpus excludes them") {
    val pages = graft.sources.Pages.load(spark, dir)
    val out = tmp("pipeurl")
    val r = Pipeline.runFull(spark, pages, out, s"$out/metrics", "pfu",
      buckets = 4, jaccardThreshold = 0.5,
      blockedHosts = Seq("src1.example.com"), maxDocsPerHost = 18L)
    val expected = graft.operators.Curation.applyUrlRules(pages, "url",
      Seq("src1.example.com"), Nil, 18L).count()
    assert(expected < 500 && r.pages == expected,
      s"pages=${r.pages} expected=$expected")
    // the blocked host is absent from verdicts AND corpus
    val verdicts = spark.read.parquet(s"$out/verdicts")
    assert(verdicts.filter(col("url").contains("//src1.example.com"))
      .count() == 0)
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() > 0)
    assert(corpus.filter(col("url").contains("//src1.example.com"))
      .count() == 0)
  }

  test("opt-in trained-classifier gate: model drops are exactly the kept " +
    "verdicts scoring under the threshold, and the corpus excludes them") {
    val pages = graft.sources.Pages.load(spark, dir)
    val out = tmp("pipemodel")
    val p = 0.5
    val r = Pipeline.runFull(spark, pages, out, s"$out/metrics", "pfm",
      buckets = 4, jaccardThreshold = 0.5, minQualityProb = Some(p))
    // independent expectation: score the committed kept verdicts directly
    val kept = spark.read.parquet(s"$out/verdicts").filter(col("keep"))
    val scored = graft.functions.ModelScores.withQualityScore(
      kept.select(col("url"), col("scrubbed_text")), "scrubbed_text")
    val expectDropUrls = scored.filter(col("quality_prob") < p)
      .select("url").collect().map(_.getString(0)).toSet
    assert(expectDropUrls.nonEmpty, "threshold not discriminating")
    assert(r.modelDropped == expectDropUrls.size,
      s"modelDropped=${r.modelDropped} expected=${expectDropUrls.size}")
    // counts close: kept = modelDropped + dupDropped + corpusDocs
    assert(r.corpusDocs == r.qualityKept - r.modelDropped - r.dupDropped)
    val corpus = spark.read.parquet(s"$out/corpus")
      .select("url").collect().map(_.getString(0)).toSet
    assert(corpus.nonEmpty && corpus.intersect(expectDropUrls).isEmpty)
    assert(r.json.contains(s""""model_dropped":${expectDropUrls.size}"""))
    // the ungated pipeline reports model_dropped 0 (identity still closes)
    val out2 = tmp("pipenogate")
    val r0 = Pipeline.runFull(spark, pages, out2, s"$out2/metrics", "pfn",
      buckets = 4, jaccardThreshold = 0.5)
    assert(r0.modelDropped == 0L)
  }

  test("kill inside the dedup phase: restart completes with a corpus " +
    "identical to an uninterrupted run") {
    val pages = graft.sources.Pages.load(spark, dir)
    val outA = tmp("pipekill")
    val killed = intercept[RuntimeException] {
      Pipeline.runFull(spark, pages, outA, s"$outA/metrics", "pfk",
        buckets = 4, jaccardThreshold = 0.5, failAfterDedupStages = 2)
    }
    assert(killed.getMessage.contains("injected failure before stage cand"))
    // filter phase committed fully before the crash
    assert(new java.io.File(s"$outA/verdicts/bucket=3/_SUCCESS").exists())
    assert(new java.io.File(s"$outA/dedup_stages/links/_SUCCESS").exists())
    assert(!new java.io.File(s"$outA/corpus/_SUCCESS").exists())
    val resumed = Pipeline.runFull(spark, pages, outA, s"$outA/metrics",
      "pfk", buckets = 4, jaccardThreshold = 0.5)
    assert(resumed.bucketsRun == 0 && resumed.bucketsSkipped == 4)
    assert(resumed.dedupStages.skipped == Seq("reps", "links"))
    assert(resumed.dedupStages.ran == Seq("cand", "pairs", "decisions"))

    val outB = tmp("pipeclean")
    val clean = Pipeline.runFull(spark, pages, outB, s"$outB/metrics", "pfc",
      buckets = 4, jaccardThreshold = 0.5)
    assert(resumed.corpusDocs == clean.corpusDocs)
    def canon(path: String) = spark.read.parquet(path)
      .select("url", "keep", "scrubbed_text")
      .collect().map(_.toString).sorted.toSeq
    assert(canon(s"$outA/corpus") == canon(s"$outB/corpus"))
    // report JSON is one valid machine-readable line
    assert(resumed.json.startsWith("{\"pages\":") &&
      resumed.json.contains("\"dedup_stages_resumed\":[\"reps\",\"links\"]"))
  }
}
