package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles a [[Check]] into a Spark plan producing metric-record rows.
  *
  * This is the Spark-native re-expression of the reference's query builder +
  * verdict evaluator (weiser/checks/base.py:189-226 `build_query`,
  * base.py:46-70 `apply_condition`, base.py:86-138 `append_result`,
  * weiser/checks/numeric.py for the per-type SELECT lists). Instead of
  * emitting one SQL string per check and evaluating verdicts row-by-row in
  * the driver, each check compiles to a single declarative DataFrame plan:
  * scan -> filter -> (grouped) aggregate -> verdict column -> metric record.
  * Catalyst then gets predicate pushdown, column pruning and whole-stage
  * codegen for free, and many checks over one table can share a scan.
  */
object CheckCompiler {

  /** CamelCase/hyphen to snake_case; port of the alias-generation regex
    * semantics in weiser/checks/base.py:31-38.
    */
  def snakeCase(s: String): String = {
    val spaced = s.replace("-", " ")
    val step1 = "([A-Z]+)".r.replaceAllIn(spaced, m => " " + m.group(1))
    val step2 = "([A-Z][a-z]+)".r.replaceAllIn(step1, m => " " + m.group(1))
    step2.trim.split("\\s+").mkString("_").toLowerCase
  }

  /** Alias for the truncated time dimension column,
    * cf. weiser/checks/base.py:40-44 (`"{name} {granularity}"` snake_cased).
    */
  def timeDimensionAlias(td: TimeDimension): String =
    snakeCase(s"${td.name} ${td.granularity}")

  /** sha256(datasource || check_name || dataset) as hex — identical bytes to
    * the reference's generate_check_id (weiser/checks/base.py:72-81).
    * Driver-side variant for config hashing.
    */
  def checkId(datasource: String, checkName: String, dataset: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(datasource.getBytes("UTF-8"))
    md.update(checkName.getBytes("UTF-8"))
    md.update(dataset.getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Plan-side check id over a (possibly group-mangled) name column. */
  def checkIdCol(datasource: String, nameCol: Column, dataset: String): Column =
    sha2(concat(lit(datasource), nameCol, lit(dataset)), 256)

  /** DATE_TRUNC across the reference's 12 granularities
    * (weiser/loader/models.py:53-65). Spark covers year..microsecond
    * natively; millennium/century/decade use DuckDB-compatible year
    * arithmetic (0-based: century of 1992 is 1900, millennium 1000 —
    * DuckDB diverges from Postgres' years-ending-in-01 convention here,
    * and DuckDB is the correctness oracle).
    */
  def dateTrunc(granularity: String, c: Column): Column =
    granularity.toLowerCase match {
      case "millennium" =>
        make_date(year(c) - pmod(year(c), lit(1000)), lit(1), lit(1)).cast(TimestampType)
      case "century" =>
        make_date(year(c) - pmod(year(c), lit(100)), lit(1), lit(1)).cast(TimestampType)
      case "decade" =>
        make_date(year(c) - pmod(year(c), lit(10)), lit(1), lit(1)).cast(TimestampType)
      case "milliseconds" => date_trunc("millisecond", c)
      case "microseconds" => date_trunc("microsecond", c)
      case g => date_trunc(g, c)
    }

  /** Named-measure registry: the Spark analog of Cube's MEASURE(name)
    * resolution (reference weiser/checks/numeric.py:18-26 and
    * metricstore/model/Metrics.yaml:11-31). Entries are aggregate Columns.
    */
  val measureRegistry: Map[String, Column] = Map(
    "count"         -> count(lit(1)).cast(DoubleType),
    "count_success" -> count(when(col("success"), lit(1))).cast(DoubleType),
    "count_fail"    -> count(when(col("fail"), lit(1))).cast(DoubleType)
  )

  /** The aggregate measure column per check type
    * (weiser/checks/numeric.py:6-70).
    */
  def measureCol(check: Check): Column = check.checkType match {
    case CheckType.RowCount => count(lit(1)).cast(DoubleType)
    case CheckType.Sum      => sum(expr(measureStr(check))).cast(DoubleType)
    case CheckType.Min      => min(expr(measureStr(check))).cast(DoubleType)
    case CheckType.Max      => max(expr(measureStr(check))).cast(DoubleType)
    case CheckType.Numeric  => expr(measureStr(check)).cast(DoubleType)
    case CheckType.Measure =>
      measureRegistry.getOrElse(measureStr(check), expr(measureStr(check))).cast(DoubleType)
    case t => throw new IllegalArgumentException(
      s"measureCol not defined for check type ${t.name}")
  }

  private def measureStr(check: Check): String = check.measure.getOrElse(
    throw new IllegalArgumentException(s"check ${check.name} requires a measure"))

  /** Resolve a dataset string to a DataFrame: bare identifier -> table in
    * `tables`, anything else -> inline SQL (the reference wraps inline SQL
    * as a subquery aliased `dataset_`, weiser/checks/base.py:178-182 —
    * Catalyst needs no alias wrapper).
    */
  def resolveDataset(spark: SparkSession, dataset: String,
                     tables: Map[String, DataFrame]): DataFrame = {
    if (isIdentifier(dataset)) tables.getOrElse(dataset, spark.table(dataset))
    else spark.sql(dataset)
  }

  def isIdentifier(s: String): Boolean =
    s.matches("[A-Za-z_][A-Za-z0-9_.]*")

  /** Lineage name of a dataset: bare names pass through; for inline SQL the
    * reference joins all table names found in the AST with "_"
    * (weiser/checks/base.py:113-117); we extract FROM/JOIN identifiers.
    */
  def datasetLineageName(dataset: String): String =
    if (isIdentifier(dataset)) dataset
    else {
      val ids = "(?i)(?:from|join)\\s+([A-Za-z_][A-Za-z0-9_.]*)".r
        .findAllMatchIn(dataset).map(_.group(1)).toSeq
      if (ids.nonEmpty) ids.mkString("_") else dataset
    }

  /** Metric-record columns appended to every verdict row; shape mirrors the
    * reference metrics store schema
    * (weiser/drivers/metric_stores/duckdb.py:150-172, models.py:6-24).
    */
  /** The canonical SQL the check compiles to — the reference stores the
    * generated query text in every metric row (`sql` column,
    * duckdb.py:150-172); here the same shape is reconstructed from the
    * declarative check (the executed plan is the Catalyst equivalent).
    */
  def generatedSql(check: Check, dataset: String): String = {
    val measure = check.checkType match {
      case CheckType.RowCount => "count(*)"
      case CheckType.Sum      => s"sum(${check.measure.getOrElse("")})"
      case CheckType.Max      => s"max(${check.measure.getOrElse("")})"
      case CheckType.Min      => s"min(${check.measure.getOrElse("")})"
      case _                  => check.measure.getOrElse("count(*)")
    }
    val dims = check.dimensions ++ check.timeDimension.map(td =>
      s"date_trunc('${td.granularity}', ${td.name})").toSeq
    val where = check.filter.map(f => s" WHERE $f").getOrElse("")
    val group = if (dims.isEmpty) "" else dims.mkString(" GROUP BY ", ", ", "")
    val select = (dims :+ s"$measure AS actual_value").mkString(", ")
    s"SELECT $select FROM $dataset$where$group"
  }

  private def finalizeRecord(df: DataFrame, check: Check, datasource: String,
                             dataset: String, runId: String,
                             runTime: java.sql.Timestamp,
                             tenantId: Int = 1): DataFrame = {
    val (thr, thrList) = check.threshold match {
      case Left(t)          => (lit(t), lit(null).cast(ArrayType(DoubleType)))
      case Right((lo, hi))  => (lit(null).cast(DoubleType), array(lit(lo), lit(hi)))
    }
    df.withColumn("check_id", checkIdCol(datasource, col("name"), dataset))
      .withColumn("type", lit(check.checkType.name))
      .withColumn("condition", lit(check.condition.name))
      .withColumn("threshold", thr)
      .withColumn("threshold_list", thrList)
      .withColumn("dataset", lit(dataset))
      .withColumn("datasource", lit(datasource))
      .withColumn("fail", !col("success"))
      .withColumn("run_id", lit(runId))
      .withColumn("run_time", lit(runTime))
      .withColumn("sql", lit(generatedSql(check, dataset)))
      .withColumn("tenant_id", lit(tenantId))
      // deterministic row identity (reference: hash(check_id+run_id+run_time)
      // % 2^31, models_duckdb.py:77-80) — sha256 here so resume can dedup
      // exactly (see MetricsStore.appendResumable)
      .withColumn("id", sha2(concat(col("check_id"), col("run_id"),
        date_format(col("run_time"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")), 256))
      .select("id", "check_id", "name", "type", "condition", "threshold",
        "threshold_list", "dataset", "datasource", "actual_value",
        "success", "fail", "run_id", "run_time", "sql", "tenant_id")
  }

  /** Run one check against one resolved dataset, producing metric rows.
    * Grouped checks emit one row per group with the dimension-mangled name
    * (weiser/checks/base.py:97-111); global checks emit exactly one row.
    */
  def runOnDataset(check: Check, df: DataFrame, datasource: String,
                   dataset: String, runId: String,
                   runTime: java.sql.Timestamp): DataFrame = {
    check.checkType match {
      case CheckType.NotEmpty | CheckType.NotEmptyPct =>
        runNotEmpty(check, df, datasource, dataset, runId, runTime)
      case CheckType.Anomaly =>
        throw new IllegalArgumentException(
          "anomaly checks run against the metrics store via AnomalyJob")
      case _ =>
        val filtered = check.filter.map(f => df.filter(expr(f))).getOrElse(df)
        val tdCol = check.timeDimension.map(td =>
          dateTrunc(td.granularity, col(td.name)).as(timeDimensionAlias(td)))
        val groupCols = check.dimensions.map(col) ++ tdCol.toSeq
        val agg = measureCol(check).as("actual_value")

        val withValue =
          if (groupCols.isEmpty) filtered.agg(agg)
          else filtered.groupBy(groupCols: _*).agg(agg)

        // group-mangled result name: name_dim1_val1_..._tdalias_tdval
        // (weiser/checks/base.py:97-111; str() of each group value)
        val dimNames = check.dimensions ++
          check.timeDimension.map(timeDimensionAlias).toSeq
        val nameCol =
          if (dimNames.isEmpty) lit(check.name)
          else concat_ws("_", lit(check.name) +:
            dimNames.flatMap(d => Seq(lit(d), col(d).cast(StringType))): _*)

        val verdict = Conditions.verdict(col("actual_value"),
          check.condition, check.threshold)
        val out = withValue
          .withColumn("name", nameCol)
          .withColumn("success", verdict)
          .drop(dimNames: _*)
        finalizeRecord(out, check, datasource, dataset, runId, runTime)
    }
  }

  /** not_empty / not_empty_pct: the reference runs ONE QUERY PER DIMENSION
    * counting NULLs with dims excluded from GROUP BY
    * (weiser/checks/numeric.py:73-151). Here all dimensions are computed in
    * a single scan (one aggregate row with N columns) and unpivoted —
    * at 100 TB, N scans vs 1 scan is the difference that matters.
    */
  private def runNotEmpty(check: Check, df: DataFrame, datasource: String,
                          dataset: String, runId: String,
                          runTime: java.sql.Timestamp): DataFrame = {
    require(check.dimensions.nonEmpty,
      "NotEmpty check requires at least one dimension to check for NULL values")
    val suffix = check.checkType match {
      case CheckType.NotEmpty    => "not_empty"
      case _                     => "not_empty_pct"
    }
    val filtered = check.filter.map(f => df.filter(expr(f))).getOrElse(df)
    val aggs = check.dimensions.map { d =>
      val nulls = sum(when(col(d).isNull, lit(1)).otherwise(lit(0)))
      val v = check.checkType match {
        case CheckType.NotEmpty => coalesce(nulls, lit(0)).cast(DoubleType)
        case _ => coalesce(nulls.cast(DoubleType) / count(lit(1)).cast(DoubleType),
          lit(0.0))
      }
      v.as(s"__ne_$d")
    }
    val oneRow = filtered.agg(aggs.head, aggs.tail: _*)
    // unpivot the single aggregate row into one metric row per dimension
    val stackExpr = check.dimensions
      .map(d => s"'${check.name}_${d}_$suffix', `__ne_$d`")
      .mkString(s"stack(${check.dimensions.size}, ", ", ", ")")
    val rows = oneRow.select(expr(stackExpr).as(Seq("name", "actual_value")))
    val verdict = Conditions.verdict(col("actual_value"),
      check.condition, check.threshold)
    finalizeRecord(rows.withColumn("success", verdict),
      check, datasource, dataset, runId, runTime)
  }

  /** Run a check over all its datasets (multi-dataset fan-out,
    * weiser/checks/base.py:140-148) and union the metric rows.
    */
  def run(check: Check, spark: SparkSession, tables: Map[String, DataFrame],
          datasource: String, runId: String,
          runTime: java.sql.Timestamp): DataFrame =
    check.dataset.map { d =>
      runOnDataset(check, resolveDataset(spark, d, tables), datasource,
        datasetLineageName(d), runId, runTime)
    }.reduce(_ unionByName _)

  /** `weiser compile` analog (reference weiser/main.py:83-109): compile every
    * check against an empty frame with the dataset schema — plan-time type
    * checking without execution. Returns the analyzed plan strings.
    */
  def compileOnly(checks: Seq[Check], spark: SparkSession,
                  schemas: Map[String, StructType]): Seq[String] = {
    val empties = schemas.map { case (n, s) =>
      n -> spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), s)
    }
    checks.filter(_.checkType != CheckType.Anomaly).map { c =>
      run(c, spark, empties, "compile", "compile",
        java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))
        .queryExecution.analyzed.toString
    }
  }
}
