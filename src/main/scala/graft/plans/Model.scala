package graft.plans

/** Configuration model of the check framework.
  *
  * Semantics mirror the reference's pydantic models
  * (reference: weiser/loader/models.py:12-100) recast as Scala ADTs:
  *   - CheckType  <- weiser/loader/models.py:12-21
  *   - Condition  <- weiser/loader/models.py:43-50
  *   - TimeDimension/Granularity <- weiser/loader/models.py:53-76
  *   - Check      <- weiser/loader/models.py:79-100
  *
  * Thresholds are `Left(scalar)` or `Right((lo, hi))` for `between`
  * (reference requires a 2-element list, weiser/checks/base.py:62-69).
  */
sealed trait CheckType { def name: String }
object CheckType {
  case object RowCount    extends CheckType { val name = "row_count" }
  case object Numeric     extends CheckType { val name = "numeric" }
  case object Sum         extends CheckType { val name = "sum" }
  case object Min         extends CheckType { val name = "min" }
  case object Max         extends CheckType { val name = "max" }
  case object Measure     extends CheckType { val name = "measure" }
  case object NotEmpty    extends CheckType { val name = "not_empty" }
  case object NotEmptyPct extends CheckType { val name = "not_empty_pct" }
  case object Anomaly     extends CheckType { val name = "anomaly" }
  val all: Seq[CheckType] =
    Seq(RowCount, Numeric, Sum, Min, Max, Measure, NotEmpty, NotEmptyPct, Anomaly)
  def parse(s: String): CheckType = all.find(_.name == s).getOrElse(
    throw new IllegalArgumentException(s"Unsupported check type: $s"))
}

sealed trait Condition { def name: String }
object Condition {
  case object Gt      extends Condition { val name = "gt" }
  case object Ge      extends Condition { val name = "ge" }
  case object Lt      extends Condition { val name = "lt" }
  case object Le      extends Condition { val name = "le" }
  case object Eq      extends Condition { val name = "eq" }
  case object Neq     extends Condition { val name = "neq" }
  case object Between extends Condition { val name = "between" }
  val all: Seq[Condition] = Seq(Gt, Ge, Lt, Le, Eq, Neq, Between)
  def parse(s: String): Condition = all.find(_.name == s).getOrElse(
    throw new IllegalArgumentException(s"Unsupported condition: $s"))
}

/** Granularities mirror the reference's 12 levels
  * (weiser/loader/models.py:53-65); Spark's date_trunc covers most
  * natively, the remainder (millennium/century/decade/microseconds) get
  * arithmetic wrappers in CheckCompiler.dateTrunc.
  */
final case class TimeDimension(name: String, granularity: String = "day")

final case class Check(
    name: String,
    dataset: Seq[String],                     // table name(s) or inline SQL
    checkType: CheckType,
    measure: Option[String] = None,           // free SQL expression
    condition: Condition = Condition.Gt,
    threshold: Either[Double, (Double, Double)] = Left(0.0),
    dimensions: Seq[String] = Nil,
    filter: Option[String] = None,            // SQL predicate string
    timeDimension: Option[TimeDimension] = None,
    checkId: Option[String] = None,           // only used by anomaly checks
    description: Option[String] = None,
    // per-check datasource pinning (reference models.py:81 accepts a
    // string or list; runner:26-37 fans a check out over exactly its own
    // datasources). Empty = run on every configured datasource.
    datasource: Seq[String] = Nil
) {
  def thresholdScalar: Double = threshold.fold(identity, _._1)
}

final case class Datasource(name: String, dsType: String = "parquet", uri: String = "")

/** Metric-store connection entry (reference models.py:198-213: the
  * `connections:` list carries where metric rows land; type `metricstore`).
  * Here the uri is a parquet/warehouse path for sources.MetricsStore.
  */
final case class Connection(name: String, connType: String = "metricstore",
                            uri: String = "")

final case class BaseConfig(
    version: Int = 1,
    checks: Seq[Check] = Nil,
    datasources: Seq[Datasource] = Nil,
    includes: Seq[String] = Nil,
    connections: Seq[Connection] = Nil,       // reference models.py:207
    slackUrl: Option[String] = None           // reference models.py:213
)
