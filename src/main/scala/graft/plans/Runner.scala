package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.MetricsStore

/** Run orchestration — the `weiser run` lifecycle
  * (reference weiser/runner/__init__.py:15-151) re-expressed on Spark:
  *
  *   load config -> validate -> probe datasources -> run every check ->
  *   append metric rows to the metrics store -> summary.
  *
  * Two deliberate divergences, both scale-driven (SURVEY.md §3.1):
  *  - the reference loops checks SEQUENTIALLY with one synchronous warehouse
  *    round-trip each (runner:40-48); here each check is a lazy plan and all
  *    metric rows are computed and appended as ONE Spark job (union of
  *    per-check aggregates — shared scans, parallel stages);
  *  - anomaly checks run against the metrics store AFTER the append, exactly
  *    like the reference (anomaly.py:16-17 queries the metric store).
  */
object Runner {

  final case class RunResult(runId: String, total: Long, successes: Long,
                             failures: Long)

  /** `weiser compile` analog: validate + plan every check, execute nothing.
    * Returns analyzed plan strings (throws on unknown columns/types).
    */
  def compile(cfg: BaseConfig, spark: SparkSession,
              tables: Map[String, DataFrame]): Seq[String] =
    CheckCompiler.compileOnly(
      cfg.checks.filter(_.checkType != CheckType.Anomaly), spark,
      tables.map { case (n, df) => n -> df.schema })

  /** Connection probe — the reference's `SELECT 1` per datasource
    * (runner:145-150).
    */
  def probe(tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (n, df) =>
      require(df.schema.nonEmpty, s"datasource table $n has no schema") }

  def run(cfg: BaseConfig, spark: SparkSession,
          tables: Map[String, DataFrame], store: MetricsStore,
          runId: String, runTime: java.sql.Timestamp,
          datasource: String = "default",
          strict: Boolean = true): RunResult = {
    probe(tables)
    val (anomalyChecks, planChecks) =
      cfg.checks.partition(_.checkType == CheckType.Anomaly)

    // one union-of-aggregates job for every non-anomaly check; each plan
    // tagged with its check index so strict validation stays one job
    val tagged = planChecks.zipWithIndex.map { case (c, i) =>
      CheckCompiler.run(c, spark, tables, datasource, runId, runTime)
        .withColumn("__ci", lit(i))
    }
    tagged.reduceOption(_ unionByName _).foreach { rows =>
      val cached = rows.cache()
      if (strict) {
        // reference parity V4: the driver raises on empty results or a
        // NULL first value (weiser/drivers/base.py:67-70) — surface
        // vanished datasets / all-NULL measures as errors, not verdicts
        val byCheck = cached.groupBy(col("__ci")).agg(
          count(lit(1)).as("n"),
          sum(when(col("actual_value").isNull, 1L).otherwise(0L)).as("nulls"))
          .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
        planChecks.zipWithIndex.foreach { case (c, i) =>
          val (n, nulls) = byCheck.getOrElse(i, (0L, 0L))
          if (n == 0) throw new IllegalStateException(
            s"Empty results for query of check: ${c.name}")
          if (nulls > 0) throw new IllegalStateException(
            s"NULL actual value for check: ${c.name}")
        }
      }
      store.appendResumable(spark, cached.drop("__ci"))
      cached.unpersist()
    }

    // anomaly checks read the (now updated) metrics history
    anomalyChecks.foreach { c =>
      val metrics = store.read(spark)
      val z = AnomalyJob.run(c, metrics)
      // keep AnomalyJob's per-dimension-mangled `name` (and its derived
      // success/fail) so dimensioned anomaly checks emit distinct
      // check_id/id per group — reference parity (base.py append_result
      // mangles name per dim value and derives check_id from it)
      val rows = z.select(
        col("name"), col("success"), col("fail"), col("actual_value"))
        .withColumn("check_id", sha2(concat(lit(datasource), col("name"),
          lit(c.dataset.head)), 256))
        .withColumn("id", sha2(concat(col("check_id"), lit(runId)), 256))
        .withColumn("type", lit(c.checkType.name))
        .withColumn("condition", lit(c.condition.name))
        .withColumn("threshold", lit(null).cast("double"))
        .withColumn("threshold_list", c.threshold match {
          case Right((lo, hi)) => array(lit(lo), lit(hi))
          case Left(t)         => array(lit(t))
        })
        .withColumn("dataset", lit(c.dataset.head))
        .withColumn("datasource", lit(datasource))
        .withColumn("run_id", lit(runId))
        .withColumn("run_time", lit(runTime))
        // the history query the anomaly ran over (reference `sql` column)
        .withColumn("sql", lit("SELECT actual_value FROM metrics WHERE " +
          s"check_id LIKE '${c.checkId.getOrElse("")}%' " +
          "ORDER BY run_time ASC LIMIT 10000"))
        .withColumn("tenant_id", lit(1))
        .select("id", "check_id", "name", "type", "condition", "threshold",
          "threshold_list", "dataset", "datasource", "actual_value",
          "success", "fail", "run_id", "run_time", "sql", "tenant_id")
      store.appendResumable(spark, rows)
    }

    // summary scoped to this (run, datasource) so multi-datasource fan-out
    // reports per-datasource results
    val s = store.read(spark)
      .filter(col("run_id") === runId && col("datasource") === datasource)
      .agg(count(lit(1)).as("total"),
        sum(when(col("success"), 1L).otherwise(0L)).as("success_count"),
        sum(when(!col("success"), 1L).otherwise(0L)).as("fail_count")).head()
    RunResult(runId, s.getAs[Long]("total"), s.getAs[Long]("success_count"),
      s.getAs[Long]("fail_count"))
  }

  /** Multi-datasource fan-out (reference runner:26-37: every check runs
    * once per EACH OF ITS OWN datasources — `Check.datasource` pins a
    * check to a subset; unpinned checks run everywhere). Each datasource
    * is a named table universe; check_ids differ per datasource by
    * construction (sha256(datasource || ...)), so the rows coexist in one
    * store.
    */
  def runAll(cfg: BaseConfig, spark: SparkSession,
             datasources: Map[String, Map[String, DataFrame]],
             store: MetricsStore, runId: String,
             runTime: java.sql.Timestamp): Seq[RunResult] =
    datasources.toSeq.sortBy(_._1).flatMap { case (name, tables) =>
      val scoped = cfg.copy(checks = cfg.checks.filter(c =>
        c.datasource.isEmpty || c.datasource.contains(name)))
      if (scoped.checks.isEmpty) None
      else Some(run(scoped, spark, tables, store, runId, runTime, name))
    }
}
