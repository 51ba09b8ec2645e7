package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.MetricsStore

/** Run-report export — the reference's export lifecycle
  * (weiser/loader/export.py:15-128 backed by the store aggregation in
  * weiser/drivers/metric_stores/duckdb.py:497-545): summary counts plus
  * the first 20 failure details, rendered (a) as Slack block-kit JSON
  * behind a transport interface — the sandbox has no egress, so the
  * default sender only prints; a real deployment plugs in an HTTP POST —
  * and (b) as a fixed-width results table for the console.
  */
object Export {

  final case class FailureDetail(
      name: String, dataset: String, datasource: String, checkId: String,
      condition: String, actualValue: Option[Double], threshold: String,
      checkType: String)

  final case class RunReport(
      runId: String, total: Long, passed: Long, failed: Long,
      failures: Seq[FailureDetail])

  /** Summary + top-`limit` failure details for one run (reference
    * export_results: summary agg + failures LIMIT 20, duckdb.py:503-528).
    */
  def report(spark: SparkSession, store: MetricsStore, runId: String,
             limit: Int = 20): RunReport = {
    val rows = store.read(spark).filter(col("run_id") === runId).cache()
    val s = rows.agg(count(lit(1)).as("total"),
      sum(when(col("success"), 1L).otherwise(0L)).as("passed"),
      sum(when(!col("success"), 1L).otherwise(0L)).as("failed")).head()
    val failures = rows.filter(!col("success"))
      .select(col("name"), col("dataset"), col("datasource"), col("check_id"),
        col("condition"), col("actual_value"), col("type"),
        coalesce(col("threshold").cast("string"),
          concat_ws(",", col("threshold_list")), lit("")).as("thr"))
      .limit(limit)
      .collect()
      .map(r => FailureDetail(r.getAs[String]("name"), r.getAs[String]("dataset"),
        r.getAs[String]("datasource"), r.getAs[String]("check_id"),
        r.getAs[String]("condition"),
        Option(r.getAs[Any]("actual_value")).map(_.toString.toDouble),
        r.getAs[String]("thr"), r.getAs[String]("type")))
      .toSeq
    rows.unpersist()
    RunReport(runId, s.getAs[Long]("total"), s.getAs[Long]("passed"),
      s.getAs[Long]("failed"), failures)
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c    => c.toString
    }

  /** Slack block-kit payload, shaped like the reference's webhook message
    * (export.py:44-78): a summary header section, then one section per
    * failure with dataset/datasource/actual value/type, plus
    * condition+threshold for non-anomaly checks.
    */
  def slackPayload(r: RunReport, runTs: java.sql.Timestamp): String = {
    val header =
      s"*Results Summary for Run ${runTs.toString.take(19)} - ${r.runId.take(8)}*\\n" +
      s"• Total Checks: ${r.total}\\n" +
      s"• Passed: ${r.passed} ✅\\n" +
      s"• Failed: ${r.failed} ❌\\n"
    def section(text: String): String =
      s"""{"type":"section","text":{"type":"mrkdwn","text":"$text"}}"""
    val failureBlocks =
      if (r.failures.isEmpty) Nil
      else section("*Failed Checks Details:*") +:
        r.failures.zipWithIndex.map { case (f, i) =>
          val base =
            s"${i + 1}. *${esc(f.name)}* (${f.checkId.take(10)})\\n" +
            s"   • Dataset: ${esc(f.dataset)}  at Data Source: ${esc(f.datasource)}\\n" +
            s"   • Actual Value: ${f.actualValue.map(_.toString).getOrElse("null")}\\n" +
            s"   • Type: ${f.checkType}\\n"
          val cond =
            if (f.checkType != "anomaly")
              s"   • Condition: ${f.condition}\\n   • Threshold: ${esc(f.threshold)}\\n"
            else ""
          section(base + cond)
        }
    val blocks = (section(header) +: failureBlocks).mkString(",")
    s"""{"text":"${header}","blocks":[$blocks]}"""
  }

  /** Transport seam for the webhook post (export.py:40-41 WebhookClient).
    * No egress in this environment — the default sender renders to stdout;
    * production swaps in an HTTP POST of `payload` to the webhook url.
    */
  trait WebhookSender { def send(payload: String): Boolean }

  object ConsoleSender extends WebhookSender {
    def send(payload: String): Boolean = { println(payload); true }
  }

  /** Sender for a configured slack_url in a no-egress environment: renders
    * the POST it would make. A deployment replaces this with an HTTP
    * client posting `payload` to `url` (reference export.py:38-41).
    */
  def printingSender(url: String): WebhookSender = new WebhookSender {
    def send(payload: String): Boolean = {
      println(s"POST $url\n$payload")
      true
    }
  }

  /** Full export: assemble the report; post to the webhook if configured.
    * Returns the report (reference export_results returns a bool; the
    * report itself is more useful to callers and tests).
    */
  def exportResults(spark: SparkSession, store: MetricsStore, runId: String,
                    runTs: java.sql.Timestamp,
                    sender: Option[WebhookSender] = None): RunReport = {
    val r = report(spark, store, runId)
    sender.foreach(_.send(slackPayload(r, runTs)))
    r
  }

  /** Machine-readable twin of the console table: the [[RunReport]] as a
    * JSON document. The reference ships results to a dashboard; a per-run
    * JSON next to the metric store makes the CLI composable (pipe into
    * jq, diff runs, alert off `failed`). Hand-rolled serialization — the
    * classpath has no JSON library and the shape is flat.
    */
  def reportJson(r: RunReport): String = {
    def js(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val failures = r.failures.map { f =>
      s"""{"name":${js(f.name)},"dataset":${js(f.dataset)},""" +
        s""""datasource":${js(f.datasource)},"check_id":${js(f.checkId)},""" +
        s""""condition":${js(f.condition)},""" +
        s""""actual_value":${f.actualValue.filter(java.lang.Double.isFinite).map(_.toString).getOrElse("null")},""" +
        s""""threshold":${js(f.threshold)},"type":${js(f.checkType)}}"""
    }.mkString("[", ",", "]")
    s"""{"run_id":${js(r.runId)},"total":${r.total},"passed":${r.passed},""" +
      s""""failed":${r.failed},"failures":$failures}"""
  }

  /** Write the per-run JSON report to `<dir>/_report_<runId>.json`;
    * returns the path written. The underscore prefix marks the file
    * hidden to Spark's file listing — the metric store IS `dir` (a
    * partitioned parquet directory), and an unprefixed sibling file
    * would be picked up as a corrupt data file by `MetricsStore.read`.
    */
  def writeReportJson(dir: String, r: RunReport): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(dir, s"_report_${r.runId}.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, reportJson(r) + "\n")
    p
  }

  /** Fixed-width console table of a run's results — the reference's
    * print_results (export.py:94-128): Check Name / Datasource / Dataset /
    * Measure / Condition / Actual Value / Threshold / Result, with the
    * check id prepended when `showIds`.
    */
  def renderTable(results: DataFrame, showIds: Boolean = false): String = {
    val base = Seq("Check Name", "Datasource", "Dataset", "Measure",
      "Condition", "Actual Value", "Threshold", "Result")
    val header = if (showIds) "Check Id" +: base else base
    val rows = results.select(col("check_id"), col("name"), col("datasource"),
        col("dataset"),
        col("type").as("measure"), col("condition"),
        col("actual_value").cast("string"),
        coalesce(col("threshold").cast("string"),
          concat_ws(",", col("threshold_list"))).as("thr"),
        when(col("fail"), "✗").otherwise("✓").as("res"))
      .collect()
      .map { r =>
        val cells = Seq(r.getString(1), r.getString(2), r.getString(3),
          Option(r.getString(4)).getOrElse(""), r.getString(5),
          Option(r.getString(6)).getOrElse("null"),
          Option(r.getString(7)).getOrElse(""), r.getString(8))
        if (showIds) r.getString(0) +: cells else cells
      }
    val widths = header.indices.map(i =>
      (header(i).length +: rows.map(_(i).length)).max)
    def fmt(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("| ", " | ", " |")
    (fmt(header) +: fmt(widths.map("-" * _)) +: rows.map(fmt)).mkString("\n")
  }
}
