package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans._
import graft.sources.{MetricsStore, SampleGenerator}

/** End-to-end run lifecycle: config -> run -> metrics store -> summary ->
  * anomaly over accumulated history (reference weiser/runner/__init__.py).
  */
class RunnerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val yaml =
    """version: 1
      |checks:
      |  - name: sales count
      |    dataset: sales
      |    type: row_count
      |    condition: gt
      |    threshold: 2
      |  - name: amount sum by grp
      |    dataset: sales
      |    type: sum
      |    measure: amount
      |    condition: between
      |    threshold: [10, 1000]
      |    dimensions: [grp]
      |""".stripMargin

  private lazy val sales = Seq(
    ("a", 10.0), ("a", 20.0), ("b", 30.0), ("b", 5000.0)
  ).toDF("grp", "amount")

  test("run executes all checks, persists metric rows, summarizes") {
    val tmp = java.nio.file.Files.createTempDirectory("runner").toString
    val cfg = ConfigLoader.parseYaml(yaml)
    val store = new MetricsStore(s"$tmp/metrics")
    val res = Runner.run(cfg, spark, Map("sales" -> sales), store, "runX",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    // 1 global row + 2 grouped rows
    assert(res.total == 3)
    assert(res.successes == 2) // rc passes, sum_a=30 in band, sum_b=5030 out
    assert(res.failures == 1)
    val names = store.read(spark).select("name").collect()
      .map(_.getString(0)).sorted
    assert(names.toSeq == Seq("amount sum by grp_grp_a",
      "amount sum by grp_grp_b", "sales count"))
    // re-running the same runId appends nothing (idempotent resume)
    val res2 = Runner.run(cfg, spark, Map("sales" -> sales), store, "runX",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    assert(res2.total == 3)
    assert(store.read(spark).count() == 3)
  }

  test("export: failure report, slack payload shape, printed table, " +
    "sql/tenant_id columns") {
    val tmp = java.nio.file.Files.createTempDirectory("export").toString
    val cfg = ConfigLoader.parseYaml(yaml)
    val store = new MetricsStore(s"$tmp/metrics")
    val runTime = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    Runner.run(cfg, spark, Map("sales" -> sales), store, "runE", runTime)
    // metric rows carry the generated sql + tenant_id (reference
    // duckdb.py:150-172 metrics schema)
    val rows = store.read(spark).filter(col("run_id") === "runE")
    val sqls = rows.select("name", "sql").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sqls("sales count") ==
      "SELECT count(*) AS actual_value FROM sales")
    assert(sqls("amount sum by grp_grp_b") ==
      "SELECT grp, sum(amount) AS actual_value FROM sales GROUP BY grp")
    assert(rows.select("tenant_id").distinct().head().getInt(0) == 1)
    // failure report: sum_b=5030 is out of [10, 1000] => 1 failure with
    // name/datasource/actual/threshold (reference duckdb.py:497-528)
    val report = Export.report(spark, store, "runE")
    assert(report.total == 3 && report.passed == 2 && report.failed == 1)
    val f = report.failures.head
    assert(f.name == "amount sum by grp_grp_b" && f.datasource == "default")
    assert(f.actualValue.contains(5030.0))
    assert(f.threshold == "10.0,1000.0" && f.condition == "between")
    // slack payload: header counts + one failure section with
    // condition/threshold (reference export.py:44-78)
    val payload = Export.slackPayload(report, runTime)
    assert(payload.contains("\"blocks\":["))
    assert(payload.contains("Total Checks: 3"))
    assert(payload.contains("amount sum by grp_grp_b"))
    assert(payload.contains("Condition: between"))
    // payload is sendable through the transport seam
    assert(Export.ConsoleSender.send(payload))
    // printed table has a row per result with verdict marks
    val table = Export.renderTable(rows, showIds = true)
    assert(table.contains("Check Id") && table.contains("Check Name"))
    assert(table.contains("sales count") && table.contains("✗")
      && table.contains("✓"))
    // machine-readable report: written next to the store (hidden to the
    // parquet listing), shape parseable with the expected fields
    val reportPath = Export.writeReportJson(store.path, report)
    assert(reportPath.getFileName.toString == "_report_runE.json")
    val json = java.nio.file.Files.readString(reportPath)
    assert(json.contains("\"run_id\":\"runE\""))
    assert(json.contains("\"total\":3") && json.contains("\"passed\":2") &&
      json.contains("\"failed\":1"))
    assert(json.contains("\"name\":\"amount sum by grp_grp_b\""))
    assert(json.contains("\"actual_value\":5030.0"))
    assert(json.contains("\"threshold\":\"10.0,1000.0\""))
    // the report file must NOT break subsequent store reads
    assert(store.read(spark).filter(col("run_id") === "runE").count() == 3)
  }

  test("anomaly check runs through Runner.run with per-dimension names") {
    val tmp = java.nio.file.Files.createTempDirectory("runneranom").toString
    val store = new MetricsStore(s"$tmp/metrics")
    // seed 8 runs of history per group: grp a is flat (anomaly z=0 passes),
    // grp b ramps hard (its last value is the outlier)
    val hist = (1 to 8).flatMap { i =>
      Seq(("a", 10.0 + (i % 2)), ("b", if (i == 8) 500.0 else 10.0 + i))
        .map { case (g, v) =>
          (s"h$g$i", "histsum", s"hist $g", v, true, false, s"seed$i",
            java.sql.Timestamp.valueOf(f"2024-05-$i%02d 00:00:00"), g)
        }
    }.toDF("id", "check_id", "name", "actual_value", "success", "fail",
      "run_id", "run_time", "grp")
    store.append(hist)
    val c = Check("vol anomaly", Seq("metrics"), CheckType.Anomaly,
      condition = Condition.Between, threshold = Right((-3.5, 3.5)),
      dimensions = Seq("grp"), checkId = Some("histsum"))
    val res = Runner.run(BaseConfig(checks = Seq(c)), spark, Map.empty,
      store, "runZ", java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    assert(res.total == 2)
    val rows = store.read(spark).filter(col("run_id") === "runZ")
      .select("name", "success").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // per-dimension mangled names (NOT one identical name per group) and
    // per-group verdicts: flat group passes, ramping group fails
    assert(rows == Map("vol anomaly_grp_a" -> true,
      "vol anomaly_grp_b" -> false))
    // distinct per-group ids: idempotent re-run appends nothing
    Runner.run(BaseConfig(checks = Seq(c)), spark, Map.empty, store, "runZ",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    assert(store.read(spark).filter(col("run_id") === "runZ").count() == 2)
  }

  test("multi-datasource fan-out: every check runs once per datasource") {
    val tmp = java.nio.file.Files.createTempDirectory("runall").toString
    val cfg = ConfigLoader.parseYaml(yaml)
    val store = new MetricsStore(s"$tmp/metrics")
    val results = Runner.runAll(cfg, spark,
      Map("ds1" -> Map("sales" -> sales),
        "ds2" -> Map("sales" -> sales.limit(2))),
      store, "runY", java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    assert(results.length == 2)
    assert(results.head.total == 3)  // ds1: 1 global + 2 groups
    val byDs = store.read(spark).groupBy("datasource").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDs("ds1") == 3 && byDs("ds2") == 2) // ds2 has only grp a rows
    // check_ids differ across datasources for the same check
    val ids = store.read(spark)
      .filter(col("name") === "sales count").select("check_id")
      .collect().map(_.getString(0)).toSet
    assert(ids.size == 2)
  }

  test("per-check datasource pinning: a check runs only on its own " +
    "datasources (reference models.py:81, runner:26-37)") {
    val tmp = java.nio.file.Files.createTempDirectory("pinned").toString
    val cfg = ConfigLoader.parseYaml(
      """checks:
        |  - {name: everywhere, dataset: sales, type: row_count,
        |     condition: gt, threshold: 0}
        |  - {name: only ds1, dataset: sales, type: row_count,
        |     condition: gt, threshold: 0, datasource: ds1}
        |  - {name: ds1 and ds2, dataset: sales, type: row_count,
        |     condition: gt, threshold: 0, datasource: [ds1, ds2]}
        |""".stripMargin)
    val store = new MetricsStore(s"$tmp/metrics")
    val results = Runner.runAll(cfg, spark,
      Map("ds1" -> Map("sales" -> sales),
        "ds2" -> Map("sales" -> sales),
        "ds3" -> Map("sales" -> sales)),
      store, "runP", java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    assert(results.map(_.total) == Seq(3, 2, 1)) // ds1, ds2, ds3
    val byDs = store.read(spark).select("datasource", "name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(byDs == Set(
      ("ds1", "everywhere"), ("ds1", "only ds1"), ("ds1", "ds1 and ds2"),
      ("ds2", "everywhere"), ("ds2", "ds1 and ds2"),
      ("ds3", "everywhere")))
  }

  test("strict mode: empty results / NULL actual value raise " +
    "(reference drivers/base.py:67-70)") {
    val tmp = java.nio.file.Files.createTempDirectory("strict").toString
    val store = new MetricsStore(s"$tmp/m")
    val ts = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    // sum over zero rows => NULL actual value => raise
    val nullCfg = ConfigLoader.parseYaml(
      """checks:
        |  - {name: s, dataset: sales, type: sum, measure: amount,
        |     condition: gt, threshold: 0, filter: "amount > 99999"}
        |""".stripMargin)
    val ex = intercept[IllegalStateException] {
      Runner.run(nullCfg, spark, Map("sales" -> sales), store, "rS", ts)
    }
    assert(ex.getMessage.contains("s"))
    // grouped check with zero groups => empty results => raise
    val emptyCfg = ConfigLoader.parseYaml(
      """checks:
        |  - {name: g, dataset: sales, type: row_count, condition: gt,
        |     threshold: 0, dimensions: [grp], filter: "grp = 'zzz'"}
        |""".stripMargin)
    val ex2 = intercept[IllegalStateException] {
      Runner.run(emptyCfg, spark, Map("sales" -> sales), store, "rS", ts)
    }
    assert(ex2.getMessage.contains("Empty results"))
    // non-strict mode records the fail verdict instead (NULL => fail)
    val res = Runner.run(nullCfg, spark, Map("sales" -> sales), store, "rS2",
      ts, strict = false)
    assert(res.total == 1 && res.failures == 1)
  }

  test("compile mode validates plans without executing") {
    val cfg = ConfigLoader.parseYaml(yaml)
    val plans = Runner.compile(cfg, spark, Map("sales" -> sales))
    assert(plans.length == 2)
    assertThrows[Exception] {
      Runner.compile(ConfigLoader.parseYaml(
        "checks:\n  - {name: bad, dataset: sales, type: sum, measure: nope}"),
        spark, Map("sales" -> sales))
    }
  }

  test("sample history is deterministic and feeds the anomaly check") {
    val h1 = SampleGenerator.history(spark, "chk", 100.0).collect()
    val h2 = SampleGenerator.history(spark, "chk", 100.0).collect()
    assert(h1.map(_.toString).toSeq == h2.map(_.toString).toSeq)
    assert(h1.length == 31)
    val vals = h1.map(_.getAs[Double]("actual_value"))
    assert(vals.forall(v => v >= 50.0 && v <= 150.0))
    // stable series stays in band; spiked series trips the z-score
    val cBase = Check("an", Seq("metrics"), CheckType.Anomaly,
      condition = Condition.Between, threshold = Right((-3.5, 3.5)),
      checkId = Some("chk"))
    val ok = AnomalyJob.run(cBase,
      SampleGenerator.history(spark, "chk", 100.0)).head()
    assert(ok.getAs[Boolean]("success"))
    val spiked = AnomalyJob.run(cBase,
      SampleGenerator.historyWithSpike(spark, "chk", 100.0)).head()
    assert(!spiked.getAs[Boolean]("success"))
    assert(math.abs(spiked.getAs[Double]("z_score")) > 3.5)
  }

  test("incremental import: run_time watermark + insert-or-ignore " +
    "(reference duckdb.py:174-268)") {
    val tmp = java.nio.file.Files.createTempDirectory("imp").toString
    val store = new MetricsStore(s"$tmp/m")
    def rows(data: Seq[(String, Double, String)]) = data
      .toDF("id", "actual_value", "rt")
      .withColumn("run_time", col("rt").cast("timestamp")).drop("rt")
      .withColumn("run_id", lit("rX")).withColumn("success", lit(true))
    store.append(rows(Seq(("a", 1.0, "2024-01-02 00:00:00"))))
    // older-than-watermark rows are skipped; duplicate ids are skipped;
    // only the genuinely new row lands
    val n = store.importIncremental(spark, rows(Seq(
      ("old", 9.0, "2024-01-01 00:00:00"),   // behind watermark
      ("a", 1.0, "2024-01-03 00:00:00"),     // would pass watermark but id exists
      ("new", 2.0, "2024-01-03 00:00:00")))) // imported
    assert(n == 1)
    assert(store.read(spark).count() == 2)
  }

  test("latest-per-check semantic measure (metrics store)") {
    val tmp = java.nio.file.Files.createTempDirectory("latest").toString
    val store = new MetricsStore(s"$tmp/m")
    val rows = Seq(
      ("id1", "c1", 1.0, "2024-01-01 00:00:00", "r1"),
      ("id2", "c1", 9.0, "2024-01-02 00:00:00", "r2"),
      ("id3", "c2", 5.0, "2024-01-01 00:00:00", "r1")
    ).toDF("id", "check_id", "actual_value", "rt", "run_id")
      .withColumn("run_time", col("rt").cast("timestamp")).drop("rt")
      .withColumn("success", lit(true))
    store.append(rows)
    val latest = store.latestPerCheck(spark).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(latest == Map("c1" -> 9.0, "c2" -> 5.0))
  }
}
