package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The metrics ledger — Spark-native reimagining of the reference's metric
  * store (weiser/drivers/metric_stores/duckdb.py). Production target is an
  * Iceberg `metrics` table (append = snapshot commit, dedup = MERGE INTO on
  * the deterministic `id`); the sandbox has no Iceberg jars, so the same
  * semantics are implemented on a parquet directory:
  *
  *  - append-only writes partitioned by run_id (one directory per run ≈ one
  *    snapshot; the reference exports one parquet per run_id too,
  *    duckdb.py:554-607)
  *  - idempotent resume: re-appending rows whose deterministic `id` already
  *    exists is dropped via left-anti join — the watermark + INSERT OR
  *    IGNORE semantics of the reference's S3 re-import (duckdb.py:174-268)
  */
class MetricsStore(val path: String) {

  def exists(spark: SparkSession): Boolean =
    Fs.nonEmptyDir(path, spark.sparkContext.hadoopConfiguration)

  /** mergeSchema: the ledger accumulates files from different engine
    * versions / dimensioned histories; reads must union their schemas
    * (missing columns => NULL) — the reference's store migrates schemas
    * the same way on import (migration_runner.py:16-59).
    */
  def read(spark: SparkSession): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Plain append (new run_id — no dedup needed). */
  def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).partitionBy("run_id").parquet(path)

  /** Idempotent append: drop rows whose id is already committed. A row's
    * id embeds its run_id, so only the incoming run_ids' store PARTITIONS
    * can contain colliding ids — the anti-join reads just those (run_id is
    * the partition column; the isin filter is a partition filter). This
    * bounds the broadcast at O(rows per run) forever, instead of shipping
    * every id ever written (which grows without bound across runs).
    */
  def appendResumable(spark: SparkSession, df: DataFrame): Long = {
    val cached = df.cache()
    val fresh =
      if (!exists(spark)) cached
      else {
        val runIds = cached.select("run_id").distinct()
          .collect().map(_.getString(0)).toSeq
        val existing = read(spark)
          .filter(col("run_id").isin(runIds: _*)).select("id")
        cached.join(broadcast(existing), Seq("id"), "left_anti")
      }
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode(SaveMode.Append).partitionBy("run_id").parquet(path)
    cached.unpersist()
    n
  }

  /** Incremental import from an external metrics dump — full semantics of
    * the reference's S3 re-import (duckdb.py:174-268): only rows newer
    * than the store's run_time watermark are considered, and of those,
    * rows whose deterministic id already exists are dropped (INSERT OR
    * IGNORE). Returns the number of rows imported.
    */
  def importIncremental(spark: SparkSession, external: DataFrame): Long = {
    val candidate =
      if (!exists(spark)) external
      else {
        // self-healing schema: store columns missing from the dump are
        // added as typed NULLs (the reference adds missing columns with
        // defaults on S3 re-import, duckdb.py:270-366); extra dump columns
        // merge on read via mergeSchema
        val have = external.columns.toSet
        val aligned = read(spark).schema.fields
          .filterNot(f => have.contains(f.name))
          .foldLeft(external)((df, f) =>
            df.withColumn(f.name, lit(null).cast(f.dataType)))
        val wm = read(spark).agg(max(col("run_time"))).head().getTimestamp(0)
        aligned.filter(col("run_time") > lit(wm))
      }
    appendResumable(spark, candidate)
  }

  /** Run summary — the reference's export aggregation
    * (duckdb.py:497-528): total / success / fail counts for a run.
    */
  def summary(spark: SparkSession, runId: String): DataFrame =
    read(spark).filter(col("run_id") === runId).agg(
      count(lit(1)).as("total"),
      sum(when(col("success"), 1L).otherwise(0L)).as("success_count"),
      sum(when(!col("success"), 1L).otherwise(0L)).as("fail_count"))

  /** Latest metric value per check — the dashboard's
    * last_value OVER (PARTITION BY check_id) semantic layer measure
    * (reference metricstore/model/Metrics.yaml:4-8), expressed as max_by
    * (one aggregation, no window shuffle-sort).
    */
  def latestPerCheck(spark: SparkSession): DataFrame =
    read(spark).groupBy(col("check_id")).agg(
      max_by(col("actual_value"), col("run_time")).as("last_value"),
      max(col("run_time")).as("last_run_time"))
}
