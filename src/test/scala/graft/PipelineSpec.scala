package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{QualityFilter, Resume}
import graft.sources.{MetricsStore, Pages}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkPages(rows: Seq[(String, String, String)]) =
    rows.map { case (url, text, lang) =>
      (url, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        Option(text).map(t => s"<html>$t</html>".getBytes("UTF-8")).orNull,
        text, lang)
    }.toDF("url", "warc_ts", "html", "text", "lang")

  private val goodText = // long, varied, stopword-rich, low symbols
    "The house is on the hill and the dog is in the garden with a cat. " +
    "It was a bright cold day in April and the clocks were striking. " +
    "This is the story of a small town by the sea where people work. " +
    "Over the years many of them came to the market for fresh bread. " +
    "At the end of the road there is an old mill that still turns."

  test("verdicts on edge documents") {
    val pages = mkPages(Seq(
      ("u1", goodText, "en"),
      ("u2", "", "en"),                       // empty => drop (length)
      ("u3", null, "en"),                     // null  => drop
      ("u4", "@#$% " * 40, "en"),             // symbol soup => drop
      ("u5", ("spam " * 60).trim, "en")       // repetition => drop
    ))
    val v = QualityFilter.run(pages).collect()
      .map(r => r.getAs[String]("url") ->
        (r.getAs[Boolean]("keep"),
          r.getAs[scala.collection.Seq[String]]("fail_reasons"))).toMap
    assert(v("u1")._1, s"good doc must pass, got ${v("u1")._2}")
    assert(!v("u2")._1 && v("u2")._2.contains("min_doc_length"))
    assert(!v("u3")._1)
    assert(!v("u4")._1 && v("u4")._2.contains("max_symbol_word_ratio"))
    assert(!v("u5")._1 && v("u5")._2.contains("max_word_repetition"))
  }

  test("html column is pruned from the scan for rule-only queries " +
    "(SURVEY §7.4 hard part 5)") {
    val dir = java.nio.file.Files.createTempDirectory("pages").toString
    mkPages(Seq(("u1", goodText, "en"))).write.mode("overwrite").parquet(dir)
    val plan = QualityFilter.run(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("html"),
      s"html must not be read by the scan: $readSchema")
  }

  test("deterministic under parallelism: repartition(2) == repartition(7)") {
    val pages = Pages.load(spark, "/root/testdata/sf0.001")
    def result(parts: Int) =
      QualityFilter.run(pages.repartition(parts))
        .select("url", "keep", "scrubbed_text", "lang_pred", "ppl")
        .collect().map(_.toString).sorted.toSeq
    assert(result(2) == result(7))
  }

  test("partition metrics: fail counts add up per rule, keyed on url bucket") {
    val pages = mkPages(Seq(
      ("u1", goodText, "en"), ("u2", "", "en"), ("u3", "", "en")))
    val ts = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val v = QualityFilter.run(pages)
    val m = QualityFilter.partitionMetrics(v, QualityFilter.defaultRules,
      "r1", ts).collect()
    val byRule = m.groupBy(_.getAs[String]("name"))
      .view.mapValues(_.map(_.getAs[Long]("actual_value")).sum).toMap
    assert(byRule("min_doc_length") == 2)
    // per-bucket doc counts sum to the corpus size for each rule
    val perRuleDocs = m.groupBy(_.getAs[String]("name"))
      .view.mapValues(_.map(_.getAs[Long]("doc_count")).sum).toMap
    assert(perRuleDocs.values.forall(_ == 3))
    assert(m.forall(r => r.getAs[Long]("pass_count") +
      r.getAs[Long]("fail_count") == r.getAs[Long]("doc_count")))
    // DETERMINISM: metric rows (incl. check_id/id) are invariant under
    // parallelism — the lineage key is a pure function of the url, not
    // spark_partition_id
    val m1 = QualityFilter.partitionMetrics(
      QualityFilter.run(pages.repartition(1)),
      QualityFilter.defaultRules, "r1", ts)
      .collect().map(_.toString).sorted
    val m7 = QualityFilter.partitionMetrics(
      QualityFilter.run(pages.repartition(7)),
      QualityFilter.defaultRules, "r1", ts)
      .collect().map(_.toString).sorted
    assert(m1.sameElements(m7))
  }

  test("resume: injected kill, rerun skips committed buckets, no dup metrics") {
    val tmp = java.nio.file.Files.createTempDirectory("resume").toString
    val out = s"$tmp/verdicts"
    val mdir = s"$tmp/metrics"
    val pages = Pages.load(spark, "/root/testdata/sf0.001")
    // first attempt dies after 3 bucket commits
    assertThrows[RuntimeException] {
      Resume.runBucketed(spark, pages, out, mdir, "runA", buckets = 8,
        failAfter = 3)
    }
    // rerun completes, skipping the 3 committed buckets
    val (ran, skipped) = Resume.runBucketed(spark, pages, out, mdir, "runA",
      buckets = 8)
    assert(skipped == 3 && ran == 5)
    // verdict table identical to a direct single-pass run
    val resumed = spark.read.parquet(out)
      .select("url", "keep", "scrubbed_text").collect()
      .map(_.toString).sorted.toSeq
    val direct = QualityFilter.run(pages)
      .select("url", "keep", "scrubbed_text").collect()
      .map(_.toString).sorted.toSeq
    assert(resumed == direct)
    // metric ids unique (idempotent re-append)
    val store = new MetricsStore(mdir)
    val ids = store.read(spark).select("id").collect().map(_.getString(0))
    assert(ids.length == ids.distinct.length)
    // re-running everything again appends nothing new
    val again = Resume.runBucketed(spark, pages, out, mdir, "runA", buckets = 8)
    assert(again == ((0, 8)))
  }

  test("resume heals a crash between data commit and metrics append") {
    val tmp = java.nio.file.Files.createTempDirectory("resumeheal").toString
    val out = s"$tmp/verdicts"
    val mdir = s"$tmp/metrics"
    val pages = Pages.load(spark, "/root/testdata/sf0.001")
    val buckets = 4
    // simulate the crash window: bucket 0's verdict parquet committed
    // (_SUCCESS exists) but the run died before its metrics were appended
    val b0 = pages.withColumn("url_bucket", Resume.bucketCol(buckets))
      .filter(col("url_bucket") === 0).drop("url_bucket")
    QualityFilter.run(b0).write.parquet(s"$out/bucket=0")
    assert(Resume.committed(out, 0) && !Resume.metricsCommitted(out, 0))
    val (ran, skipped) =
      Resume.runBucketed(spark, pages, out, mdir, "runH", buckets)
    assert(ran == 3 && skipped == 1)
    // the healed bucket's metric rows are present, not silently lost
    val m = new MetricsStore(mdir).read(spark)
    assert(m.filter(col("url_bucket") === 0).count() > 0)
    assert(Resume.metricsCommitted(out, 0))
    // all 4 buckets' lineage rows exist exactly once
    val ids = m.select("id").collect().map(_.getString(0))
    assert(ids.length == ids.distinct.length)
    assert(m.select("url_bucket").distinct().count() == buckets)
  }

  test("skewed hosts: two-stage salted aggregation equals direct groupBy") {
    // 90% of rows on one host — the skew fixture
    val pages = mkPages((0 until 200).map { i =>
      val host = if (i < 180) "hot.example.com" else s"h$i.example.com"
      (s"https://$host/p$i", goodText, "en")
    })
    val direct = pages
      .groupBy(regexp_extract(col("url"), "https://([^/]+)/", 1).as("host"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // salted two-stage: partial agg on (host, salt), final on host
    val salted = pages
      .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1))
      .withColumn("salt", pmod(xxhash64(col("url")), lit(16)))
      .groupBy(col("host"), col("salt")).agg(count(lit(1)).as("pn"))
      .groupBy(col("host")).agg(sum(col("pn")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(direct("hot.example.com") == 180)
  }

  test("hostStats (salted two-stage) equals direct groupBy on skewed hosts") {
    val pages = mkPages((0 until 200).map { i =>
      val host = if (i < 180) "hot.example.com" else s"h$i.example.com"
      (s"https://$host/p$i", if (i % 2 == 0) goodText else "", "en")
    })
    val v = QualityFilter.run(pages, QualityFilter.heuristicRules)
    val salted = QualityFilter.hostStats(v).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = v
      .withColumn("host", regexp_extract(col("url"), "https?://([^/]+)/", 1))
      .groupBy("host").agg(count(lit(1)).as("n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct)
    assert(salted("hot.example.com") == ((180L, 90L)))
  }

  test("flagship entry returns rows with expected schema") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet.contains("keep"))
    assert(df.columns.toSet.contains("scrubbed_text"))
  }
}

class EvalSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keepF1: exact counts on a synthetic confusion matrix") {
    // 4 TP, 1 FP, 2 FN, 3 TN over 10 docs
    val pred = ((1 to 5).map(i => (s"u$i", true)) ++
      (6 to 10).map(i => (s"u$i", false))).toDF("url", "keep")
    val ref = ((1 to 4).map(i => (s"u$i", true)) ++
      Seq(("u5", false)) ++ (6 to 7).map(i => (s"u$i", true)) ++
      (8 to 10).map(i => (s"u$i", false))).toDF("url", "keep")
    val m = graft.operators.Eval.keepF1(pred, ref)
    assert(m.n == 10 && m.truePos == 4 && m.falsePos == 1 && m.falseNeg == 2)
    assert(math.abs(m.precision - 0.8) < 1e-12)
    assert(math.abs(m.recall - 4.0 / 6.0) < 1e-12)
    assert(math.abs(m.f1 - 2 * 0.8 * (4.0 / 6.0) / (0.8 + 4.0 / 6.0)) < 1e-12)
  }

  test("north-rule acceptance shape: fused pipeline F1 = 1.0 against the " +
    "mapPartitions island reference labels") {
    val pages = graft.sources.Pages.load(spark, "/root/testdata/sf0.001")
    val pred = graft.operators.QualityFilter.run(pages)
    // independent reference: the island path computes keep from the same
    // rule set through a different execution route
    val st = org.apache.spark.sql.functions.col("__ts")
    val verdicts = graft.operators.QualityFilter
      .ruleVerdicts(graft.operators.QualityFilter.defaultRules, Some(st))
    val ref = graft.functions.ModelScores
      .withAllMeasures(pages.drop("html"), "text", models = true)
      .withColumn("keep", verdicts.map(_._2).reduce(_ && _))
    val m = graft.operators.Eval.keepF1(pred, ref)
    assert(m.n == 500)
    assert(m.f1 == 1.0, s"F1 ${m.f1} (tp=${m.truePos} fp=${m.falsePos} fn=${m.falseNeg})")
  }
}
