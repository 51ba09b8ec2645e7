package graft.plans

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** YAML check-config loader — semantics of the reference's loader
  * (weiser/loader/config.py:14-104):
  *   - {{VAR}} templating from the environment (config.py:70-74; the
  *     reference renders through full Jinja2 — we support the
  *     variable-substitution subset, which covers every shipped reference
  *     example; loops/conditionals in YAML configs are NOT supported and
  *     fail loudly as unsubstituted text)
  *   - `.env` file loading under the process environment
  *     (weiser/main.py:52-59 python-dotenv parity, see [[envForConfig]])
  *   - recursive `includes` with a visited set (config.py:80-98)
  *   - namespace merge: concatenate checks/datasources, dedupe includes
  *     (config.py:14-29)
  * Uses snakeyaml from Spark's classpath (no extra dependency).
  */
object ConfigLoader {

  def substituteEnv(raw: String, env: Map[String, String] = sys.env): String =
    "\\{\\{\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\}\\}".r
      .replaceAllIn(raw, m => java.util.regex.Matcher
        .quoteReplacement(env.getOrElse(m.group(1), "")))

  def parseYaml(raw: String): BaseConfig = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = Option(yaml.load[java.util.Map[String, Object]](raw))
      .map(_.asScala.toMap).getOrElse(Map.empty[String, Object])
    BaseConfig(
      version = root.get("version").map(_.toString.toInt).getOrElse(1),
      checks = list(root, "checks").map(parseCheck),
      datasources = list(root, "datasources").map { m =>
        Datasource(str(m, "name").get, str(m, "type").getOrElse("parquet"),
          str(m, "uri").getOrElse(""))
      },
      includes = root.get("includes").map(
        _.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString))
        .getOrElse(Nil),
      connections = list(root, "connections").map { m =>
        Connection(str(m, "name").getOrElse("default"),
          str(m, "type").getOrElse("metricstore"),
          str(m, "uri").orElse(str(m, "db_name")).getOrElse(""))
      },
      slackUrl = root.get("slack_url").flatMap(Option(_)).map(_.toString)
        .filter(_.nonEmpty)
    )
  }

  private def list(root: Map[String, Object], key: String): Seq[Map[String, Object]] =
    root.get(key).map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
      .asScala.toSeq.map(_.asScala.toMap)).getOrElse(Nil)

  private def str(m: Map[String, Object], k: String): Option[String] =
    m.get(k).flatMap(Option(_)).map(_.toString)

  private def parseCheck(m: Map[String, Object]): Check = {
    val threshold: Either[Double, (Double, Double)] = m.get("threshold") match {
      case Some(l: java.util.List[_]) =>
        val s = l.asScala.map(_.toString.toDouble)
        require(s.size == 2,
          "Condition 'between' requires a threshold list with two elements")
        Right((s.head, s(1)))
      case Some(v) => Left(v.toString.toDouble)
      case None    => Left(0.0)
    }
    val datasets: Seq[String] = m.get("dataset") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
      case Some(s)                    => Seq(s.toString)
      case None => throw new IllegalArgumentException("check requires dataset")
    }
    val td = m.get("time_dimension").map { o =>
      val tm = o.asInstanceOf[java.util.Map[String, Object]].asScala
      TimeDimension(tm("name").toString,
        tm.get("granularity").map(_.toString).getOrElse("day"))
    }
    Check(
      name = str(m, "name").get,
      dataset = datasets,
      checkType = CheckType.parse(str(m, "type").getOrElse("numeric")),
      measure = str(m, "measure"),
      condition = Condition.parse(str(m, "condition").getOrElse("gt")),
      threshold = threshold,
      dimensions = m.get("dimensions").map(
        _.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString))
        .getOrElse(Nil),
      filter = str(m, "filter"),
      timeDimension = td,
      checkId = str(m, "check_id"),
      description = str(m, "description"),
      // string or list, like `dataset` (reference models.py:81)
      datasource = m.get("datasource") match {
        case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
        case Some(s)                    => Seq(s.toString)
        case None                       => Nil
      }
    )
  }

  /** Merge two configs: concatenated checks/datasources, deduped includes
    * (reference config.py:14-29).
    */
  def merge(a: BaseConfig, b: BaseConfig): BaseConfig = BaseConfig(
    version = a.version,
    checks = a.checks ++ b.checks,
    datasources = a.datasources ++ b.datasources,
    includes = (a.includes ++ b.includes).distinct,
    connections = a.connections ++ b.connections,
    slackUrl = a.slackUrl.orElse(b.slackUrl))

  /** Parse a dotenv file (KEY=VALUE lines; `#` comments, optional
    * `export ` prefix, single/double quotes stripped). Returns empty for a
    * missing file. Mirrors the reference's python-dotenv load before
    * templating (weiser/main.py:52-59).
    */
  def loadDotEnv(path: String): Map[String, String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Map.empty
    new String(Files.readAllBytes(p), "UTF-8").linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map { l =>
        val line = if (l.startsWith("export ")) l.drop(7).trim else l
        val i = line.indexOf('=')
        val k = line.take(i).trim
        var v = line.drop(i + 1).trim
        if (v.length >= 2 &&
          ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
          v = v.substring(1, v.length - 1)
        k -> v
      }
      .filter(_._1.nonEmpty)
      .toMap
  }

  /** Template environment for a config at `cfgPath`: a `.env` next to the
    * config (or in the working directory) merged UNDER the process
    * environment — python-dotenv's default load_dotenv(override=False)
    * behavior (weiser/main.py:52-59): real env vars win.
    */
  def envForConfig(cfgPath: String,
                   processEnv: Map[String, String] = sys.env): Map[String, String] = {
    val byConfig = Option(Paths.get(cfgPath).toAbsolutePath.getParent)
      .map(_.resolve(".env").toString).map(loadDotEnv).getOrElse(Map.empty)
    val byCwd = loadDotEnv(".env")
    byCwd ++ byConfig ++ processEnv
  }

  /** Load with recursive includes. The visited set is threaded through the
    * whole walk (siblings included) so diamond includes (A->B->D, A->C->D)
    * load D exactly once — the reference loader shares one visited_path
    * dict across the walk (config.py:80-98).
    */
  def load(path: String, env: Map[String, String] = sys.env,
           visited: Set[String] = Set.empty): BaseConfig =
    loadAcc(path, env, visited)._1

  private def loadAcc(path: String, env: Map[String, String],
                      visited: Set[String]): (BaseConfig, Set[String]) = {
    val canonical = Paths.get(path).toAbsolutePath.normalize.toString
    if (visited.contains(canonical))
      return (BaseConfig(), visited)
    val raw = new String(Files.readAllBytes(Paths.get(canonical)), "UTF-8")
    val cfg = parseYaml(substituteEnv(raw, env))
    cfg.includes.foldLeft((cfg, visited + canonical)) {
      case ((acc, vis), inc) =>
        val incPath =
          if (Paths.get(inc).isAbsolute) inc
          else Paths.get(canonical).getParent.resolve(inc).toString
        val (sub, vis2) = loadAcc(incPath, env, vis)
        (merge(acc, sub), vis2)
    }
  }
}
