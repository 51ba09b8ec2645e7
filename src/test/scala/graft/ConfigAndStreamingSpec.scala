package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans._
import graft.streaming.EventStream

class ConfigLoaderSpec extends AnyFunSuite {

  private val yaml =
    """version: 1
      |datasources:
      |  - name: default
      |    type: parquet
      |checks:
      |  - name: min doc length
      |    dataset: pages
      |    type: numeric
      |    measure: length(text)
      |    condition: ge
      |    threshold: 200
      |  - name: ppl band
      |    dataset: [pages, pages2]
      |    type: measure
      |    measure: ppl
      |    condition: between
      |    threshold: [20, 1000]
      |    dimensions: [lang]
      |    filter: "lang = '{{GRAFT_TEST_LANG}}'"
      |    time_dimension: {name: warc_ts, granularity: day}
      |""".stripMargin

  test("YAML parses into the Check model with env substitution") {
    val cfg = ConfigLoader.parseYaml(
      ConfigLoader.substituteEnv(yaml, Map("GRAFT_TEST_LANG" -> "en")))
    assert(cfg.checks.length == 2)
    val c1 = cfg.checks.head
    assert(c1.name == "min doc length" && c1.checkType == CheckType.Numeric)
    assert(c1.condition == Condition.Ge && c1.threshold == Left(200.0))
    val c2 = cfg.checks(1)
    assert(c2.dataset == Seq("pages", "pages2"))
    assert(c2.threshold == Right((20.0, 1000.0)))
    assert(c2.filter.contains("lang = 'en'"))
    assert(c2.timeDimension.contains(TimeDimension("warc_ts", "day")))
  }

  test("includes merge concatenates checks and dedupes includes") {
    val tmp = java.nio.file.Files.createTempDirectory("cfg")
    java.nio.file.Files.writeString(tmp.resolve("base.yaml"),
      "checks:\n  - {name: a, dataset: t, type: row_count}\nincludes: [extra.yaml]\n")
    java.nio.file.Files.writeString(tmp.resolve("extra.yaml"),
      "checks:\n  - {name: b, dataset: t, type: row_count}\n")
    val cfg = ConfigLoader.load(tmp.resolve("base.yaml").toString)
    assert(cfg.checks.map(_.name) == Seq("a", "b"))
  }

  test("between threshold list must have exactly two elements") {
    assertThrows[IllegalArgumentException] {
      ConfigLoader.parseYaml(
        "checks:\n  - {name: x, dataset: t, type: numeric, threshold: [1,2,3]}")
    }
  }
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed agg equals its batch twin on the events table") {
    val dir = "/root/testdata/sf0.001"
    // streaming readStream needs a directory of parquet part-files
    val tmp = java.nio.file.Files.createTempDirectory("events").toString
    spark.read.parquet(s"$dir/events.parquet").repartition(3)
      .write.mode("overwrite").parquet(tmp)
    // cast win_start to string: memory-sink rows carry java.sql.Timestamp,
    // batch rows LocalDateTime — same instant, different toString
    import org.apache.spark.sql.functions.col
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("win_start", col("win_start").cast("string"))
        .collect().map(_.toString).sorted.toSeq
    val streamed = canon(EventStream.runOnce(spark, tmp, "evt_win_test"))
    val batch = canon(EventStream.windowedAgg(spark.read.parquet(tmp)))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
