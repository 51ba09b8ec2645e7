package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `pages` input table — Common-Crawl-style web pages with the exact
  * shape mandated by BASELINE.json `input_hint`:
  *
  *   pages(url: string, warc_ts: timestamp, html: binary, text: string,
  *         lang: string)
  *
  * In production this is an Iceberg table partitioned by days(warc_ts) +
  * bucket(N, url). In-sandbox it is synthesized DETERMINISTICALLY from the
  * driver's documents.parquet (TESTDATA.md) — a pure column mapping, no
  * randomness, so the DuckDB oracle can re-derive the identical table and
  * local[8]/local[32] runs see identical input.
  */
object Pages {

  /** Deterministic url bucket — THE lineage/layout/resume key. A pure
    * function of the url (first 60 bits of md5, mod n), so bucket identity
    * is invariant under parallelism, partitioning, restarts and engines:
    * the DuckDB twin is `('0x' || substr(md5(url),1,15))::BIGINT % n`.
    * md5 rather than xxhash64 because only md5 is bit-identical across
    * engines; one md5 per row is noise next to per-doc scoring work.
    */
  def urlBucket(url: Column, n: Int): Column =
    pmod(conv(substring(md5(url), 1, 15), 16, 10).cast(LongType), lit(n))

  /** DuckDB twin of [[urlBucket]] for oracle SQL. */
  def urlBucketSql(urlExpr: String, n: Int): String =
    s"(('0x' || substr(md5($urlExpr), 1, 15))::BIGINT % $n)"

  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)
  ))

  /** documents(doc_id, text, lang, source, n_chars) -> pages.
    *
    * - url: https://<source>.example.com/doc/<doc_id> (host = source, so the
    *   20 sources give a realistic skewed-host distribution)
    * - warc_ts: 2024-01-01T00:00:00Z + doc_id hours (deterministic spread
    *   over ~days for time_dimension checks)
    * - html: the text wrapped in a minimal page, utf-8 bytes
    * - a deterministic PII suffix is injected into every 10th document so
    *   the scrub path is exercised end-to-end on driver data
    */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val piiSuffix = concat(lit(" contact: user"), col("doc_id"),
      lit("@example.com or call 555-123-4567 ip 10.0.0.1"))
    val text = when(pmod(col("doc_id"), lit(10)) === 0,
      concat(col("text"), piiSuffix)).otherwise(col("text"))
    docs.select(
      concat(lit("https://"), col("source"), lit(".example.com/doc/"),
        col("doc_id")).as("url"),
      (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long") +
        col("doc_id") * 3600L).cast(TimestampType).as("warc_ts"),
      encode(concat(lit("<html><body>"), text, lit("</body></html>")), "UTF-8")
        .as("html"),
      text.as("text"),
      col("lang")
    )
  }

  def load(spark: SparkSession, sfDir: String): DataFrame =
    fromDocuments(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Deterministically replicated bench corpus: documents x factor, each
    * replica with a distinct doc_id (rep * 10M + doc_id) and therefore a
    * distinct url/warc_ts. Used by Bench so the throughput/scaling
    * measurement is compute-bound rather than overhead-bound — the
    * testdata documents table is far too small to feed 32 cores.
    */
  def loadReplicated(spark: SparkSession, sfDir: String, factor: Int): DataFrame = {
    // repartition the small base table FIRST: the broadcast cross join and
    // everything downstream (synthesis, scoring, scrub) are then narrow and
    // spread over all cores — crossing before repartitioning would run the
    // whole synthesis in the base table's single input task
    // 2 tasks per core: a single wave of cores-sized tasks lets one
    // straggler (OS jitter, shared-VM neighbor) stall the whole stage
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism * 2)
    val reps = broadcast(spark.range(factor).select(col("id").as("rep")))
    fromDocuments(
      docs.crossJoin(reps)
        .withColumn("doc_id", col("rep") * 10000000L + col("doc_id"))
        .drop("rep"))
  }

  /** Write pages with the production partition layout: daily partitions
    * (the Iceberg `days(warc_ts)` transform expressed as a derived date
    * column) plus a url-hash bucket column. Rule-only jobs filtered by
    * crawl date then touch only matching directories — partition pruning
    * is THE scan-cost lever at 10^12 documents (PlanSpec asserts the
    * pruned plan).
    */
  def writePartitioned(pages: DataFrame, dir: String, urlBuckets: Int = 16): Unit =
    pages
      .withColumn("warc_date", to_date(col("warc_ts")))
      .withColumn("url_bucket", urlBucket(col("url"), urlBuckets))
      .write.mode("overwrite")
      .partitionBy("warc_date", "url_bucket")
      .parquet(dir)

  /** DuckDB SQL re-deriving the same pages table from documents, for
    * oracle queries (kept in one place so every oracle shares it).
    */
  val duckdbCte: String =
    """pages AS (
      |  SELECT
      |    'https://' || source || '.example.com/doc/' || doc_id AS url,
      |    TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id * 3600) AS warc_ts,
      |    CASE WHEN doc_id % 10 = 0
      |         THEN text || ' contact: user' || doc_id ||
      |              '@example.com or call 555-123-4567 ip 10.0.0.1'
      |         ELSE text END AS text,
      |    lang
      |  FROM documents
      |)""".stripMargin
}
