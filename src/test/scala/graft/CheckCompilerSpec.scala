package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans._

/** Check-compiler parity with the reference's base machinery
  * (weiser/checks/base.py; reference tests tests/unit/test_base_check.py).
  */
class CheckCompilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val runTime = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")

  private lazy val sales = Seq(
    ("a", "2024-01-03 10:00:00", 10.0, Some("x")),
    ("a", "2024-01-04 11:00:00", 20.0, None),
    ("b", "2024-02-05 12:00:00", 30.0, Some("y")),
    ("b", "2024-02-06 13:00:00", 40.0, Some("z")),
    ("b", "2024-02-07 14:00:00", 50.0, None)
  ).toDF("grp", "ts_s", "amount", "tag")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  private def run(c: Check) = CheckCompiler.run(
    c, spark, Map("sales" -> sales), "ds1", "run1", runTime)

  test("snake_case matches reference regex semantics (test_base_check.py:27-38)") {
    assert(CheckCompiler.snakeCase("CamelCase") == "camel_case")
    assert(CheckCompiler.snakeCase("some-name") == "some_name")
    assert(CheckCompiler.snakeCase("ALLCAPS") == "allcaps")
    assert(CheckCompiler.snakeCase("created_at day") == "created_at_day")
    assert(CheckCompiler.snakeCase("HTTPServer") == "http_server")
  }

  test("check_id = sha256(datasource||name||dataset), stable (base.py:72-81)") {
    val id = CheckCompiler.checkId("ds1", "my_check", "sales")
    assert(id == CheckCompiler.checkId("ds1", "my_check", "sales"))
    assert(id != CheckCompiler.checkId("ds2", "my_check", "sales"))
    assert(id.length == 64 && id.matches("[0-9a-f]+"))
    // plan-side column produces the identical digest
    val planId = spark.range(1)
      .select(CheckCompiler.checkIdCol("ds1", lit("my_check"), "sales"))
      .head().getString(0)
    assert(planId == id)
  }

  test("global row_count check emits one verdict row") {
    val rows = run(Check("rc", Seq("sales"), CheckType.RowCount,
      condition = Condition.Gt, threshold = Left(3))).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Double]("actual_value") == 5.0)
    assert(r.getAs[Boolean]("success"))
    assert(!r.getAs[Boolean]("fail"))
    assert(r.getAs[String]("name") == "rc")
  }

  test("grouped sum check mangles names with dimension values (base.py:97-111)") {
    val rows = run(Check("s", Seq("sales"), CheckType.Sum,
      measure = Some("amount"), condition = Condition.Gt, threshold = Left(25),
      dimensions = Seq("grp"))).collect().sortBy(_.getAs[String]("name"))
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("s_grp_a", "s_grp_b"))
    assert(rows.map(_.getAs[Double]("actual_value")).toSeq == Seq(30.0, 120.0))
    assert(rows.map(_.getAs[Boolean]("success")).toSeq == Seq(true, true))
    // per-group check_id uses the mangled name
    assert(rows(0).getAs[String]("check_id") ==
      CheckCompiler.checkId("ds1", "s_grp_a", "sales"))
  }

  test("time_dimension adds date_trunc group + alias (base.py:201-207)") {
    val rows = run(Check("m", Seq("sales"), CheckType.Max,
      measure = Some("amount"), condition = Condition.Lt, threshold = Left(45),
      timeDimension = Some(TimeDimension("ts", "month"))))
      .collect().sortBy(_.getAs[String]("name"))
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq(
      "m_ts_month_2024-01-01 00:00:00", "m_ts_month_2024-02-01 00:00:00"))
    assert(rows.map(_.getAs[Boolean]("success")).toSeq == Seq(true, false))
  }

  test("filter is applied before aggregation (base.py:215-216)") {
    val rows = run(Check("f", Seq("sales"), CheckType.RowCount,
      condition = Condition.Eq, threshold = Left(2),
      filter = Some("grp = 'a'"))).collect()
    assert(rows(0).getAs[Double]("actual_value") == 2.0)
    assert(rows(0).getAs[Boolean]("success"))
  }

  test("not_empty: one row per dimension, single scan, suffix naming " +
    "(numeric.py:73-140)") {
    val rows = run(Check("ne", Seq("sales"), CheckType.NotEmpty,
      condition = Condition.Le, threshold = Left(0),
      dimensions = Seq("tag", "grp"))).collect()
      .sortBy(_.getAs[String]("name"))
    assert(rows.map(_.getAs[String]("name")).toSeq ==
      Seq("ne_grp_not_empty", "ne_tag_not_empty"))
    val byName = rows.map(r => r.getAs[String]("name") ->
      (r.getAs[Double]("actual_value"), r.getAs[Boolean]("success"))).toMap
    assert(byName("ne_tag_not_empty") == ((2.0, false)))
    assert(byName("ne_grp_not_empty") == ((0.0, true)))
  }

  test("not_empty_pct computes null fraction (numeric.py:143-151)") {
    val rows = run(Check("ne", Seq("sales"), CheckType.NotEmptyPct,
      condition = Condition.Le, threshold = Left(0.5),
      dimensions = Seq("tag"))).collect()
    assert(rows(0).getAs[Double]("actual_value") == 0.4)
    assert(rows(0).getAs[Boolean]("success"))
  }

  test("not_empty without dimensions raises (numeric.py:95-98)") {
    assertThrows[IllegalArgumentException] {
      run(Check("ne", Seq("sales"), CheckType.NotEmpty))
    }
  }

  test("multi-dataset fan-out unions one result per dataset (base.py:140-148)") {
    val other = sales.limit(2)
    val rows = CheckCompiler.run(
      Check("rc", Seq("sales", "other"), CheckType.RowCount,
        condition = Condition.Gt, threshold = Left(0)),
      spark, Map("sales" -> sales, "other" -> other), "ds1", "run1", runTime)
      .collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("dataset")).toSet == Set("sales", "other"))
  }

  test("inline-SQL dataset resolves through spark.sql (base.py:178-182)") {
    sales.createOrReplaceTempView("sales")
    val rows = run(Check("isql",
      Seq("SELECT * FROM sales WHERE amount > 15"), CheckType.RowCount,
      condition = Condition.Eq, threshold = Left(4))).collect()
    assert(rows(0).getAs[Boolean]("success"))
    assert(rows(0).getAs[String]("dataset") == "sales") // lineage = table name
  }

  test("date_trunc covers all 12 granularities") {
    val ts = Seq("2024-05-17 13:45:30").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val granExpect = Seq(
      "millennium" -> "2000-01-01 00:00:00", "century" -> "2000-01-01 00:00:00",
      "decade" -> "2020-01-01 00:00:00", "year" -> "2024-01-01 00:00:00",
      "quarter" -> "2024-04-01 00:00:00", "month" -> "2024-05-01 00:00:00",
      "week" -> "2024-05-13 00:00:00", "day" -> "2024-05-17 00:00:00",
      "hour" -> "2024-05-17 13:00:00", "minute" -> "2024-05-17 13:45:00",
      "second" -> "2024-05-17 13:45:30", "milliseconds" -> "2024-05-17 13:45:30")
    granExpect.foreach { case (g, exp) =>
      val got = ts.select(CheckCompiler.dateTrunc(g, col("ts")).cast("string"))
        .head().getString(0)
      assert(got == exp, s"granularity $g")
    }
  }

  test("compile-only mode type-checks every rule against empty schemas " +
    "(main.py:83-109 analog)") {
    val plans = CheckCompiler.compileOnly(
      Seq(Check("c1", Seq("sales"), CheckType.Sum, measure = Some("amount"),
        condition = Condition.Gt, threshold = Left(0))),
      spark, Map("sales" -> sales.schema))
    assert(plans.length == 1 && plans.head.contains("Aggregate"))
    // a bad column name fails at compile time, not run time
    assertThrows[Exception] {
      CheckCompiler.compileOnly(
        Seq(Check("c2", Seq("sales"), CheckType.Sum, measure = Some("nope"),
          condition = Condition.Gt, threshold = Left(0))),
        spark, Map("sales" -> sales.schema))
    }
  }

  test("unsupported check type string raises (checks/__init__.py factory)") {
    assertThrows[IllegalArgumentException](CheckType.parse("bogus"))
    assertThrows[IllegalArgumentException](Condition.parse("bogus"))
  }
}
