package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Fs, MetricsStore, Pages}

/** Checkpoint-based resume for the quality-filter job.
  *
  * Production shape: each bucket commit is an Iceberg snapshot; a killed
  * run restarts at the last committed snapshot (north rule). Sandbox shape
  * (no Iceberg jars): the corpus is split into `buckets` deterministic
  * url-hash buckets; each bucket is processed and written as one atomic
  * parquet job. The commit protocol has TWO markers per bucket:
  *
  *   1. `_SUCCESS`    — the verdict parquet job committed (written by Spark)
  *   2. `_METRICS_OK` — the bucket's metric rows were appended to the store
  *
  * A crash between the two leaves a bucket with data committed but metrics
  * missing; restart detects that state and re-appends ONLY the metrics
  * (idempotent — MetricsStore.appendResumable dedups on the deterministic
  * id), so no metric row is ever silently lost and no document is
  * reprocessed. Same watermark + INSERT OR IGNORE semantics as the
  * reference's S3 re-import (weiser/drivers/metric_stores/duckdb.py:174-268).
  *
  * Determinism requirement (SURVEY.md §7.4): bucket assignment is
  * Pages.urlBucket — a pure md5-based function of the url, so any
  * parallelism level, restart, or engine produces identical buckets, and
  * metric check_ids (keyed on the same bucket inside
  * QualityFilter.partitionMetrics) are stable across restarts.
  *
  * Scan economics: if the input DataFrame already carries a `url_bucket`
  * column — i.e. it was read from the Pages.writePartitioned layout — the
  * per-bucket filter is a PARTITION filter and each bucket job reads only
  * its own files (asserted by PlanSpec). Without the layout the filter
  * degrades to a full scan per bucket; at 10^12 documents always use the
  * partitioned layout.
  */
object Resume {

  def bucketCol(buckets: Int) = Pages.urlBucket(col("url"), buckets)

  // commit markers through Hadoop's FileSystem (round-7 ADVICE fix):
  // java.io.File made resume skipping inert on non-local stage storage
  def committed(outDir: String, bucket: Int): Boolean =
    Fs.exists(s"$outDir/bucket=$bucket/_SUCCESS")

  def metricsCommitted(outDir: String, bucket: Int): Boolean =
    Fs.exists(s"$outDir/bucket=$bucket/_METRICS_OK")

  private def markMetricsCommitted(outDir: String, bucket: Int): Unit =
    Fs.touch(s"$outDir/bucket=$bucket/_METRICS_OK")

  /** Run the pipeline bucket-by-bucket; returns (bucketsRun, bucketsSkipped).
    * `failAfter` injects a crash after N bucket commits (for the kill/rerun
    * test).
    */
  def runBucketed(spark: SparkSession, pages: DataFrame, outDir: String,
                  metricsDir: String, runId: String,
                  buckets: Int = 8, failAfter: Int = Int.MaxValue,
                  rules: Seq[RowRule] = QualityFilter.defaultRules): (Int, Int) = {
    val store = new MetricsStore(metricsDir)
    val runTime = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    var ran = 0
    var skipped = 0
    // partition-pruned path when the url_bucket layout column exists
    val withBucket =
      if (pages.columns.contains("url_bucket")) pages
      else pages.withColumn("url_bucket", bucketCol(buckets))

    def appendBucketMetrics(b: Int): Unit = {
      val metrics = QualityFilter.partitionMetrics(
        spark.read.parquet(s"$outDir/bucket=$b"),
        rules, runId, runTime, buckets)
      store.appendResumable(spark, metrics)
      markMetricsCommitted(outDir, b)
    }

    (0 until buckets).foreach { b =>
      if (committed(outDir, b)) {
        // data committed; heal a crash that hit between the parquet commit
        // and the metrics append (idempotent by deterministic id)
        if (!metricsCommitted(outDir, b)) appendBucketMetrics(b)
        skipped += 1
      } else {
        if (ran >= failAfter)
          throw new RuntimeException(s"injected failure before bucket $b")
        val part = withBucket.filter(col("url_bucket") === b).drop("url_bucket")
        val verdicts = QualityFilter.run(part, rules)
        verdicts.write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/bucket=$b")
        appendBucketMetrics(b)
        ran += 1
      }
    }
    (ran, skipped)
  }
}
