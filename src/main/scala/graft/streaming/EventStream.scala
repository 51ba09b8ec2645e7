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

  /** Batch sessionization: gap-based sessions per user (lag -> new-session
    * flag -> running sum = session id -> per-session aggregate). The
    * standard two-window formulation; SQL-expressible, so DuckDB oracles
    * it (q_sessionize).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          // TIMESTAMP_NTZ has no direct long cast; session tz is UTC so
          // the ltz round-trip is value-preserving
          col("ts").cast("timestamp").cast("long") -
            col("prev_ts").cast("timestamp").cast("long") >
            gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
  }

  /** Native `session_window` twin of [[sessionize]] — same gap semantics
    * expressed through Spark's built-in session-window aggregation
    * instead of the lag/running-sum window pair (one aggregation, no
    * analytic-window pass; the streaming-capable formulation).
    *
    * Boundary note: session_window merges an event into the session when
    * it arrives strictly BEFORE prev+gap, while [[sessionize]] starts a
    * new session only when the difference EXCEEDS the gap — the two
    * differ on events exactly `gap` apart. StreamingSpec asserts full
    * parity on the events table (which has no exact-gap ties).
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming variant of [[sessionWindowAgg]]: watermarked event-time
    * session windows (state closes once the watermark passes a session's
    * end + gap).
    */
  def streamingSessionWindow(spark: SparkSession, dir: String,
                             name: String): DataFrame = {
    val q = sessionWindowAgg(
        spark.readStream.schema(eventSchema).parquet(dir)
          .withWatermark("ts", "1 hour"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Append-mode streaming session window over a file source, for callers
    * that feed files incrementally (returns the LIVE query; results land
    * in the memory table `name`). Append mode is where the watermark's
    * state-eviction contract is observable: a session is emitted — and
    * its state dropped — once the watermark passes session end + gap, so
    * an event arriving later that would have merged into that session is
    * DISCARDED, not merged and not re-emitted. The late-data test pins
    * exactly that.
    */
  def streamingSessionWindowAppend(spark: SparkSession, dir: String,
                                   name: String, gapMinutes: Int = 30,
                                   watermark: String = "1 hour")
      : org.apache.spark.sql.streaming.StreamingQuery =
    sessionWindowAgg(
        spark.readStream.schema(eventSchema).parquet(dir)
          .withWatermark("ts", watermark), gapMinutes)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()

  /** STREAMING QUALITY FILTER: the same fused verdict pipeline
    * (operators/QualityFilter — stateless narrow transforms, so it lifts
    * to Structured Streaming unchanged) over a readStream file source,
    * with the production delivery contract:
    *
    *  - exactly-once verdict delivery: each micro-batch overwrites its own
    *    batch-keyed directory, so a replay after a crash rewrites the same
    *    files instead of duplicating them; the checkpoint tracks which
    *    input files are consumed;
    *  - idempotent lineage: per-batch url-bucket metrics append through
    *    MetricsStore.appendResumable with ids keyed on
    *    (check_id, runId, batchId) — a replayed batch dedups to zero rows.
    *
    * Restarting the query with the same checkpoint resumes at the first
    * unprocessed input file (the streaming analog of operators/Resume's
    * bucket commits; ConfigAndStreamingSpec proves the restart behavior).
    */
  def streamingQualityFilter(spark: SparkSession, pagesDir: String,
                             outDir: String, checkpointDir: String,
                             metricsDir: String, runId: String,
                             runTime: java.sql.Timestamp,
                             rules: Seq[graft.operators.RowRule] =
                               graft.operators.QualityFilter.defaultRules)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val pages = spark.readStream.schema(graft.sources.Pages.schema)
      .parquet(pagesDir)
    val verdicts = graft.operators.QualityFilter.run(pages, rules)
    verdicts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        val b = batch.persist()
        b.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        val store = new graft.sources.MetricsStore(metricsDir)
        val metrics = graft.operators.QualityFilter
          .partitionMetrics(b, rules, runId, runTime)
          .withColumn("id", sha2(concat(col("check_id"), lit(runId),
            lit(batchId.toString)), 256))
        store.appendResumable(b.sparkSession, metrics)
        b.unpersist()
        ()
      }
      .start()
  }

  /** Stateful streaming 1: exactly-once event dedup by key over the stream
    * (state-store backed), with a watermark bounding state size.
    */
  def streamingDedup(spark: SparkSession, dir: String, name: String): DataFrame = {
    val q = spark.readStream.schema(eventSchema).parquet(dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** STREAMING CONTENT DEDUP: first-seen-wins exact dedup over a pages
    * stream by content fingerprint, emitting an explicit keep DECISION
    * per document — `dropDuplicates` silently discards losers, but the
    * corpus pipeline's lineage/metrics need the keep=false rows. Keyed
    * state via flatMapGroupsWithState: one winning url per distinct
    * fingerprint (~50 bytes), sharded across executors by fingerprint at
    * cluster scale — O(distinct texts) state, the streaming analog of the
    * batch collapse stage. Semantics: FIRST batch seen wins across
    * batches (streams can't revisit history); the minimum url wins within
    * a batch, matching the batch operator's min-key rule, so a
    * single-batch stream reproduces `Dedup.exact` exactly.
    */
  def streamingContentDedup(spark: SparkSession, pagesDir: String,
                            outDir: String,
                            checkpointDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val decisions = spark.readStream.schema(graft.sources.Pages.schema)
      .parquet(pagesDir)
      .select(col("url"), md5(coalesce(col("text"), lit(""))).as("fp"))
      .as[(String, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (fp: String, rows: Iterator[(String, String)],
         state: GroupState[String]) => {
          val urls = rows.map(_._1).toArray.sorted
          state.getOption match {
            case Some(_) =>
              // a winner exists from an earlier batch: everything loses
              urls.iterator.map(u => (u, fp, false))
            case None =>
              val winner = urls.head
              state.update(winner)
              urls.iterator.map(u => (u, fp, u == winner))
          }
        })
      .toDF("url", "fingerprint", "keep")
    // checkpointed fingerprint state SURVIVES restarts: a resumed query
    // keeps honoring winners chosen before the crash (the streaming
    // analog of the batch DAG's committed reps stage). Batch-keyed
    // parquet dirs give exactly-once delivery like streamingQualityFilter.
    val q = decisions.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(outDir)
  }

  /** Stateful streaming 2: custom per-key running totals via
    * mapGroupsWithState — the KeyValueGroupedDataset state-machine shape
    * for logic built-in aggregations can't express.
    */
  def runningUserTotals(spark: SparkSession, dir: String, name: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val updates = spark.readStream.schema(eventSchema).parquet(dir)
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Double]) => {
          val total = state.getOption.getOrElse(0.0) + rows.map(_._2).sum
          state.update(total)
          (user, total)
        })
      .toDF("user_id", "total")
    val q = updates.writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
