package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.MetricsStore

/** Checkpoint-based resume for the quality-filter job.
  *
  * Production shape: each bucket commit is an Iceberg snapshot; a killed
  * run restarts at the last committed snapshot (north rule). Sandbox shape
  * (no Iceberg jars): the corpus is split into `buckets` deterministic
  * url-hash buckets; each bucket is processed and written as one atomic
  * parquet job (directory + _SUCCESS marker = the snapshot commit); on
  * restart, committed buckets are skipped, and metric rows re-emitted for
  * a re-run bucket are deduplicated by their deterministic id
  * (MetricsStore.appendResumable) — the same watermark + INSERT OR IGNORE
  * semantics as the reference's S3 re-import
  * (weiser/drivers/metric_stores/duckdb.py:174-268).
  *
  * Determinism requirement (SURVEY.md §7.4): bucket assignment is
  * pmod(xxhash64(url), buckets) — a pure function of the row, so any
  * parallelism level and any restart produces identical buckets.
  */
object Resume {

  def bucketCol(buckets: Int) = pmod(xxhash64(col("url")), lit(buckets))

  def committed(outDir: String, bucket: Int): Boolean =
    new java.io.File(s"$outDir/bucket=$bucket/_SUCCESS").exists()

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
    val withBucket = pages.withColumn("__bucket", bucketCol(buckets))
    (0 until buckets).foreach { b =>
      if (committed(outDir, b)) { skipped += 1 }
      else {
        if (ran >= failAfter)
          throw new RuntimeException(s"injected failure before bucket $b")
        val part = withBucket.filter(col("__bucket") === b).drop("__bucket")
        val verdicts = QualityFilter.run(part, rules)
        verdicts.write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/bucket=$b")
        val metrics = QualityFilter.partitionMetrics(
          spark.read.parquet(s"$outDir/bucket=$b"),
          rules, runId, runTime)
          // metric identity must be stable across restarts: key on bucket,
          // not on the ephemeral partition id
          .withColumn("id", sha2(concat(col("check_id"), lit(b.toString)), 256))
        store.appendResumable(spark, metrics)
        ran += 1
      }
    }
    (ran, skipped)
  }
}
