package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is strictly batch
  * (SURVEY.md §2.11) — its nearest analogs are the run_id batch identity
  * and the re-import watermark — but a web-scale ingest pipeline needs the
  * streaming shape, so the same aggregations are exposed over readStream:
  * event-time tumbling windows with a watermark for late data. The batch
  * and streaming variants share the aggregation expression, so the DuckDB
  * oracle validates the batch twin (`q_event_window` in SparkEntry).
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Shared aggregation: 5-minute tumbling windows per event_type. */
  def windowedAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("v"))

  /** Streaming variant with a 10-minute watermark for late rows. */
  def streamingWindowedAgg(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(
      spark.readStream.schema(eventSchema).parquet(dir)
        .withWatermark("ts", "10 minutes"))

  /** Run the streaming query to completion over the (finite) parquet input
    * via the memory sink; returns the result as a batch DataFrame. Used by
    * tests to prove streaming/batch parity.
    */
  def runOnce(spark: SparkSession, dir: String, name: String): DataFrame = {
    val q = streamingWindowedAgg(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
