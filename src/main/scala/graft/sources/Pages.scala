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

  /** Deterministic UNSEGMENTED no-space-script sample texts (zh/ja/th,
    * no inter-word spaces — the shape real Common-Crawl pages in those
    * scripts actually have), injected into every 20th page so the
    * driver's DuckDB oracle exercises the script-adaptive word rules on
    * both keep and drop outcomes. FROZEN literals: both engines must
    * synthesize byte-identical pages. Index 0-6 are clean prose (keep);
    * 7 is keyword stuffing (dropped by repetition_adaptive), 8 is
    * CJK-symbol soup (dropped by symbol_ratio_adaptive), 9 is too short
    * (dropped by min_doc_length).
    */
  val noSpaceDemoTexts: Array[String] = Array(
    // zh clean prose
    "这是一个大的国家我们的生活每天都在变化人们在城市里工作和学习他们说中文也要学习别的语言因为世界上有很多不同的人和文化。我们以后要去看看这个世界用自己的方法去理解生活中大大小小的事情。每个人都有自己的想法和要走的路大家要用时间去发现生活里真正重要的东西然后好好地过自己的日子。",
    "中文的文本处理是一个很有意思的问题因为中文不用空格分开词语所以机器要先学会分词才能理解句子的意思。这个系统现在可以直接处理没有分词的文本了我们不需要上游的分词器也能得到正确的结果。这样一来大家在用这个系统的时候就不用为了分词的事情发愁了处理的速度也比以前快了很多。",
    "他们在学校里学习数学和科学还有历史老师说学习要用心每天都要做作业。放学以后孩子们一起去公园里玩有的人在打球有的人在跑步大家都很开心因为天气很好。到了晚上家里人坐在一起吃饭说一天里发生的事情然后孩子们看一会儿书就去睡觉了。",
    // ja clean prose
    "日本の生活はとても便利ですが人々はいつも忙しいと言われていますこの町には大きな学校とたくさんの店がありますみんな毎日電車で仕事に行きます。新しいことを学ぶのは楽しいことだと思います。週末には家族と公園へ行ったり友だちと話したりしてゆっくりした時間を過ごすことができますから生活の中に小さな楽しみがあります。",
    "このシステムは分かち書きのない日本語のテキストをそのまま処理することができますから前処理の必要はありませんこれは大きな進歩だと思いますみなさんもぜひ使ってみてください。文字の種類を見て規則を切り替えるというやり方はとても簡単ですがいろいろな言語の文章に対してうまく働くことが分かりました。",
    // th clean prose
    "ที่นี่มีคนมากมายและพวกเขาทำงานในเมืองใหญ่ทุกวันเด็กไปโรงเรียนเพื่อเรียนภาษาและประวัติศาสตร์ครอบครัวอยู่ด้วยกันในบ้านที่มีความสุขและทุกคนก็ช่วยกันทำงานบ้านในเวลาเย็น",
    "ระบบนี้สามารถประมวลผลข้อความภาษาไทยที่ไม่มีการเว้นวรรคได้โดยตรงเพราะกฎการกรองคุณภาพจะปรับตัวตามชนิดของตัวอักษรและการนับคำหยุดก็ใช้การค้นหาสายอักขระแทนการแบ่งคำ",
    // zh keyword stuffing -> repetition_adaptive ~0.97
    "便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买便宜买",
    // CJK-symbol soup -> symbol_ratio_adaptive ~0.5
    "的※一★是☆在◆不■了〓有≡和※人★这☆中◆大■为〓上≡个※我★以☆要◆他■们〓的≡一※是★在☆不◆了■有〓和≡人※这★中☆大◆为■上〓个≡我※以★要◆他■们〓的※一★是☆在◆不■了〓有≡和※人★这☆中◆大■为〓上≡个※我★。",
    // too short -> min_doc_length
    "这是一个太短的文本。"
  )

  /** DuckDB list literal of [[noSpaceDemoTexts]] (no quotes in the
    * frozen texts by construction).
    */
  val noSpaceDemoSql: String =
    noSpaceDemoTexts.map(t => s"'$t'").mkString("[", ", ", "]")

  /** documents(doc_id, text, lang, source, n_chars) -> pages.
    *
    * - url: https://<source>.example.com/doc/<doc_id> (host = source, so the
    *   20 sources give a realistic skewed-host distribution)
    * - warc_ts: 2024-01-01T00:00:00Z + doc_id hours (deterministic spread
    *   over ~days for time_dimension checks)
    * - html: the text wrapped in a minimal page, utf-8 bytes
    * - a deterministic PII suffix is injected into every 10th document so
    *   the scrub path is exercised end-to-end on driver data
    * - every 20th document's text is replaced by an unsegmented zh/ja/th
    *   sample ([[noSpaceDemoTexts]], cycled) so the script-adaptive rules
    *   run against the oracle on driver data too (~5% of a crawl being
    *   no-space-script is roughly Common-Crawl-shaped)
    */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val demoIdx = (pmod(floor(col("doc_id") / 20), lit(noSpaceDemoTexts.length))
      .cast("int") + 1)
    val base = when(pmod(col("doc_id"), lit(20)) === 7,
      element_at(array(noSpaceDemoTexts.map(lit).toSeq: _*), demoIdx))
      .otherwise(col("text"))
    val piiSuffix = concat(lit(" contact: user"), col("doc_id"),
      lit("@example.com or call 555-123-4567 ip 10.0.0.1"))
    val text = when(pmod(col("doc_id"), lit(10)) === 0,
      concat(base, piiSuffix)).otherwise(base)
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
    s"""pages AS (
      |  SELECT
      |    'https://' || source || '.example.com/doc/' || doc_id AS url,
      |    TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id * 3600) AS warc_ts,
      |    CASE WHEN doc_id % 10 = 0
      |         THEN base || ' contact: user' || doc_id ||
      |              '@example.com or call 555-123-4567 ip 10.0.0.1'
      |         ELSE base END AS text,
      |    lang
      |  FROM (
      |    SELECT doc_id, lang, source,
      |      CASE WHEN doc_id % 20 = 7
      |           THEN ($noSpaceDemoSql)[
      |             ((doc_id // 20) % ${noSpaceDemoTexts.length} + 1)::INT]
      |           ELSE text END AS base
      |    FROM documents)
      |)""".stripMargin
}
