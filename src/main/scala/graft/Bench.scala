package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main. Measures the headline operators end-to-end with a noop
  * sink (forces full materialization of every column — `.count()` would let
  * Catalyst prune the computed columns away) and evidences the north rule's
  * two-cluster-size scaling criterion by running the flagship pipeline at
  * local[8] and local[32] on the same input (sandbox proxy for N vs 4N
  * executors; BASELINE.md).
  *
  * Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "docs_per_sec":N,"scaling":{"local8_docs_per_sec":...,
  *  "local32_docs_per_sec":...,"efficiency":...}}
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  /** Median of `n` timed runs. */
  private def med(n: Int)(body: => Unit): Double = {
    val ts = (1 to n).map(_ => time(body)).sorted
    ts(n / 2)
  }

  // headline operators: the quality-filter pipeline + the scale-critical ops
  private val headline = Seq(
    "pipeline_full", "pipeline_verdict", "scrub_pii",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ann_topk", "q_check_sum_time", "q_check_anomaly", "q_join_revenue",
    "q_event_window", "text_quality")

  /** Scaling corpus: the pipeline job must be compute-bound to evidence
    * cluster-size scaling; 5k testdata docs can't feed 32 cores.
    */
  private val replication =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATION", "150").toInt

  private def scalingJob(s: SparkSession, sfDir: String): DataFrame =
    graft.operators.QualityFilter.run(
      graft.sources.Pages.loadReplicated(s, sfDir, replication))
      .select("url", "keep", "fail_reasons", "scrubbed_text", "lang_pred", "ppl")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // ---- headline per-query timings at local[32] ----
    val s32 = session(32)
    val baseDocs = s32.read.parquet(s"$sfDir/documents.parquet").count()
    val docCount = baseDocs * replication
    // one warm-up of the flagship to exclude JVM/codegen first-run cost
    force(SparkEntry.queries("pipeline_full")(s32, sfDir))
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      name -> med(3) { force(fn(s32, sfDir)) }
    }
    // ---- throughput + scaling: full pipeline over the replicated corpus
    force(scalingJob(s32, sfDir)) // warm-up
    val pipelineSec32 = med(3) { force(scalingJob(s32, sfDir)) }
    val docsPerSec32 = docCount / pipelineSec32
    s32.stop()

    // ---- scaling evidence: same job, same input, local[8] ----
    val s8 = session(8)
    force(scalingJob(s8, sfDir)) // warm-up
    val pipelineSec8 = med(3) { force(scalingJob(s8, sfDir)) }
    val docsPerSec8 = docCount / pipelineSec8
    s8.stop()

    // efficiency = (throughput32 / throughput8) / (32/8)
    val efficiency = (docsPerSec32 / docsPerSec8) / 4.0

    val qs = results.map { case (k, v) => s""""$k":${f"$v%.4f"}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":${f"$total%.4f"},"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","docs":$docCount,""" +
      s""""docs_per_sec":${f"$docsPerSec32%.1f"},""" +
      s""""scaling":{"local8_docs_per_sec":${f"$docsPerSec8%.1f"},""" +
      s""""local32_docs_per_sec":${f"$docsPerSec32%.1f"},""" +
      s""""local8_sec":${f"$pipelineSec8%.4f"},"local32_sec":${f"$pipelineSec32%.4f"},""" +
      s""""efficiency":${f"$efficiency%.3f"}}}""")
  }
}
