package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the production quality-filter job:
  *
  *   spark-submit --class graft.Main <jar> \
  *     <pagesParquetDir> <verdictOutDir> <metricsDir> <runId> [buckets] [configYaml]
  *
  * Runs the full pipeline (langid + perplexity + heuristic rules + scrub +
  * verdict) bucket-by-bucket with checkpoint-resume: a killed run restarts
  * at the last committed bucket and re-appended metric rows deduplicate on
  * their deterministic ids (operators/Resume). Rules come from the YAML
  * config's checks: block when given, else QualityFilter.defaultRules.
  * In local testing, master/session settings come from the launcher; on a
  * cluster spark-submit supplies them.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: graft.Main <pagesDir> <outDir> <metricsDir> <runId> [buckets] [configYaml]")
    val Array(pagesDir, outDir, metricsDir, runId) = args.take(4)
    val buckets = if (args.length > 4) args(4).toInt else 64
    val builder = SparkSession.builder()
      .appName(s"graft-quality-filter-$runId")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; bare JVM launches fall back to
    // local mode for testing
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rules =
      if (args.length > 5) {
        val cfg = graft.plans.ConfigLoader.load(args(5))
        val fromCfg = cfg.checks.map(graft.operators.RowRule.fromCheck)
        require(fromCfg.nonEmpty, "config has no checks")
        fromCfg
      } else graft.operators.QualityFilter.defaultRules
    graft.operators.Resume.runBucketed(spark,
      spark.read.parquet(pagesDir), outDir, metricsDir, runId, buckets,
      rules = rules)

    val summary = new graft.sources.MetricsStore(metricsDir)
      .summary(spark, runId).head()
    println(s"run $runId complete: total=${summary.getAs[Long]("total")} " +
      s"success=${summary.getAs[Long]("success_count")} " +
      s"fail=${summary.getAs[Long]("fail_count")}")
    spark.stop()
  }
}
