package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: Spark's `bucketBy` persists a table
  * pre-shuffled on a key, so every later equi-join or aggregation on
  * that key reads the co-located layout instead of paying a shuffle —
  * the right trade when a table is written once and joined many times
  * (a committed corpus joined per-snapshot by incremental dedup, a
  * metrics store grouped per dashboard query). Both join sides must be
  * bucketed on the join key with the SAME bucket count for the exchange
  * to disappear (PlanSpec pins exactly that plan shape); one bucketed
  * side still saves its own exchange when counts differ in a ratio
  * Spark can coalesce.
  *
  * Bucketing only exists through the catalog (`saveAsTable`) — a plain
  * `parquet(path)` write drops the bucket spec — so these helpers wrap
  * the catalog call and the repartition-to-buckets that keeps each
  * bucket in one file per task's worth of data instead of
  * tasks×buckets fragments.
  */
object Bucketed {

  /** Write `df` as a catalog table bucketed (and sorted) by `key`.
    * The pre-repartition on the bucket key means each task holds whole
    * buckets, so the writer emits ~one file per bucket instead of one
    * per (task, bucket) — at 100 TB the difference between `buckets`
    * files and millions.
    */
  def save(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-key same-count bucketed tables: shuffle-free by
    * construction (the bucketed scans already satisfy the join's
    * required distribution).
    */
  def colocatedJoin(spark: SparkSession, tableA: String, tableB: String,
                    key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), Seq(key))
}
