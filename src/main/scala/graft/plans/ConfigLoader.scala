package graft.plans

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** YAML check-config loader — semantics of the reference's loader
  * (weiser/loader/config.py:14-104):
  *   - {{VAR}} templating from the environment (config.py:70-74; the
  *     reference renders through full Jinja2 — we support the
  *     variable-substitution subset plus Jinja-semantics conditionals,
  *     {% if %}/{% elif %}/{% else %}/{% endif %} with nesting, `not`,
  *     and ==/!= string comparison, which covers every shipped reference
  *     example and the conditional-block pattern real configs use; any
  *     other {% statement %} — for/set/macro/filters — fails loudly with
  *     the statement named, never renders as silent text)
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

  /** Full template render: `{% if %}` conditional blocks first (so a
    * dropped branch's `{{VAR}}` references never render), then variable
    * substitution.
    */
  def renderTemplate(raw: String, env: Map[String, String] = sys.env): String =
    substituteEnv(renderConditionals(raw, env), env)

  private val stmtPat = "\\{%\\s*(.*?)\\s*%\\}".r

  /** Jinja2-semantics conditional subset: `{% if EXPR %}` / `{% elif %}` /
    * `{% else %}` / `{% endif %}`, nested arbitrarily. EXPR is `VAR`
    * (Jinja truthiness for string env: defined AND non-empty),
    * `not EXPR`, or `VAR == 'literal'` / `VAR != "literal"`. Any other
    * statement keyword fails loudly — an unrendered `{% for %}` silently
    * parsed as YAML text is exactly the class of config bug this loader
    * refuses to ship.
    */
  def renderConditionals(raw: String, env: Map[String, String]): String = {
    sealed trait Tok
    final case class Text(s: String) extends Tok
    final case class Stmt(s: String) extends Tok
    val toks = scala.collection.mutable.Buffer.empty[Tok]
    var last = 0
    for (m <- stmtPat.findAllMatchIn(raw)) {
      if (m.start > last) toks += Text(raw.substring(last, m.start))
      toks += Stmt(m.group(1))
      last = m.end
    }
    if (last < raw.length) toks += Text(raw.substring(last))
    if (toks.forall(_.isInstanceOf[Text])) return raw

    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"config template: $msg (supported: {{VAR}}, {% if/elif/else/endif %} " +
        "with not and ==/!= string comparison)")

    val cmpPat = "([A-Za-z_][A-Za-z0-9_]*)\\s*(==|!=)\\s*['\"](.*)['\"]".r
    def truthy(expr: String): Boolean = expr.trim match {
      case s if s.startsWith("not ") => !truthy(s.substring(4))
      case cmpPat(v, op, lit) =>
        val value = env.getOrElse(v, "")
        if (op == "==") value == lit else value != lit
      case v if v.matches("[A-Za-z_][A-Za-z0-9_]*") =>
        env.get(v).exists(_.nonEmpty)
      case other => fail(s"unsupported {% if %} expression '$other'")
    }

    var i = 0
    def parseIf(firstCond: String): String = {
      var result: Option[String] = None
      var cond = firstCond
      var inElse = false
      while (true) {
        val (body, stop) = parseBlock(inIf = true)
        if (result.isEmpty && (inElse || truthy(cond))) result = Some(body)
        stop match {
          case None => fail("unterminated {% if %} (missing {% endif %})")
          case Some(s) =>
            s.split("\\s+", 2).toList match {
              case "endif" :: _ => return result.getOrElse("")
              case "elif" :: rest =>
                if (inElse) fail("{% elif %} after {% else %}")
                cond = rest.headOption.filter(_.nonEmpty)
                  .getOrElse(fail("{% elif %} without an expression"))
              case "else" :: _ =>
                if (inElse) fail("duplicate {% else %}")
                inElse = true
              case _ => fail(s"unexpected statement '{% $s %}' inside if")
            }
        }
      }
      "" // unreachable
    }
    // renders until an elif/else/endif terminator (returned, consumed) or
    // end of input; nested ifs recurse. Untaken branches still PARSE
    // fully (Jinja semantics: syntax errors don't hide in dead branches).
    def parseBlock(inIf: Boolean): (String, Option[String]) = {
      val sb = new StringBuilder
      while (i < toks.length) {
        toks(i) match {
          case Text(s) => sb ++= s; i += 1
          case Stmt(s) =>
            val kw = s.split("\\s+", 2)(0)
            if (inIf && (kw == "elif" || kw == "else" || kw == "endif")) {
              i += 1
              return (sb.toString, Some(s))
            }
            kw match {
              case "if" =>
                i += 1
                val cond = s.split("\\s+", 2).lift(1)
                  .getOrElse(fail("{% if %} without an expression"))
                sb ++= parseIf(cond)
              case "elif" | "else" | "endif" =>
                fail(s"'{% $s %}' without a matching {% if %}")
              case other =>
                fail(s"unsupported statement '{% $s %}'")
            }
        }
      }
      (sb.toString, None)
    }
    parseBlock(inIf = false)._1
  }

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
    val cfg = parseYaml(renderTemplate(raw, env))
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
