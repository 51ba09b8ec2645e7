package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic metrics-history bootstrap — the `weiser sample` analog
  * (reference weiser/runner/__init__.py:52-116 synthesizes 31 days of
  * history with random.randint(threshold ± threshold/2) to seed anomaly
  * checks). The reference's RNG is replaced with a seeded hash so
  * `sbt -batch test` is reproducible (FIXTURES.md §5): the "random" value
  * for (checkId, day) is a pure function of both.
  */
object SampleGenerator {

  /** value in [threshold - threshold/2, threshold + threshold/2], uniform
    * via xxhash64(checkId, day) — same shape as the reference's randint.
    */
  def history(spark: SparkSession, checkId: String, threshold: Double,
              days: Int = 31,
              start: String = "2024-01-01"): DataFrame = {
    val span = math.max(threshold, 1.0) // randint span, cf. runner:92-101
    spark.range(days)
      .select(
        lit(checkId).as("check_id"),
        (to_timestamp(lit(s"$start 00:00:00")).cast("long") +
          col("id") * 86400L).cast("timestamp").as("run_time"),
        (lit(threshold - span / 2) +
          (pmod(xxhash64(lit(checkId), col("id")), lit(100000L))
            .cast("double") / 100000.0) * span).as("actual_value"))
  }

  /** Same series with a deterministic spike injected on the final day —
    * the anomaly-test fixture (|z| >> 3.5).
    */
  def historyWithSpike(spark: SparkSession, checkId: String,
                       threshold: Double, days: Int = 31,
                       spikeFactor: Double = 20.0): DataFrame = {
    val h = history(spark, checkId, threshold, days)
    h.withColumn("actual_value",
      when(col("run_time") === h.agg(max("run_time")).head().getTimestamp(0),
        col("actual_value") * spikeFactor).otherwise(col("actual_value")))
  }
}
