package graft.plans

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** YAML check-config loader — semantics of the reference's loader
  * (weiser/loader/config.py:14-104):
  *   - {{VAR}} templating from the environment (config.py:70-74; the
  *     reference renders through full Jinja2 — we support the
  *     variable-substitution subset plus the upper/lower/trim/default
  *     filter chain, Jinja-semantics conditionals
  *     ({% if %}/{% elif %}/{% else %}/{% endif %} with nesting, `not`,
  *     ==/!= string comparison) and {% for %} loops over VAR.split/
  *     literal lists, which covers every shipped reference example and
  *     the patterns real configs use; any other {% statement %} —
  *     set/macro — or unsupported {{ expression }} fails loudly with the
  *     construct named, never renders as silent text)
  *   - `.env` file loading under the process environment
  *     (weiser/main.py:52-59 python-dotenv parity, see [[envForConfig]])
  *   - recursive `includes` with a visited set (config.py:80-98)
  *   - namespace merge: concatenate checks/datasources, dedupe includes
  *     (config.py:14-29)
  * Uses snakeyaml from Spark's classpath (no extra dependency).
  */
object ConfigLoader {

  /** `{{ VAR }}` / `{{ VAR|filter|... }}` expression: a variable plus an
    * optional chain of supported filters. Filter args are single quoted
    * literals (quote pairs exact, like the if-expressions).
    */
  private val exprPat =
    ("\\{\\{\\s*([A-Za-z_][A-Za-z0-9_]*)" +
      "((?:\\s*\\|\\s*[A-Za-z_][A-Za-z0-9_]*(?:\\([^()]*\\))?)*)\\s*\\}\\}").r
  private val filterPat =
    ("\\|\\s*([A-Za-z_][A-Za-z0-9_]*)" +
      "(?:\\(\\s*(?:'([^']*)'|\"([^\"]*)\")\\s*\\))?").r

  /** `{{VAR}}` substitution plus the Jinja2 filter subset the reference's
    * renderer accepts on env strings: `upper`, `lower`, `trim`,
    * `default('lit')` — chained left to right with Jinja's undefined
    * semantics (default Jinja2 environment: an undefined variable renders
    * "" through string filters, `default` replaces only the undefined
    * value, and a defined-but-empty value is NOT defaulted). Any other
    * `{{ ... }}` content — unknown filters, malformed args, expressions —
    * fails loudly by name: Jinja would evaluate it, so shipping it as
    * literal YAML text would be a silent misrender.
    */
  def substituteEnv(raw: String, env: Map[String, String] = sys.env): String = {
    def failT(msg: String): Nothing = throw new IllegalArgumentException(
      s"config template: $msg (supported filters: upper, lower, trim, " +
        "default('lit'))")
    // any '{{' in the TEMPLATE not consumed by exprPat is an expression
    // this subset does not support (math, method calls, bad names) —
    // Jinja would evaluate it, so passing it through as text is the
    // silent-misrender class this loader refuses; same discipline as the
    // stray-'{%' guard. Checked on the raw input, not the output: a
    // substituted env VALUE containing '{{' is plain text by design.
    locally {
      val spans = exprPat.findAllMatchIn(raw).map(m => (m.start, m.end)).toList
      var idx = raw.indexOf("{{")
      while (idx >= 0) {
        if (!spans.exists { case (s, e) => idx >= s && idx < e })
          failT("unsupported or malformed '{{' expression near " +
            s"[${raw.substring(idx).take(40)}]")
        idx = raw.indexOf("{{", idx + 2)
      }
    }
    val out = exprPat.replaceAllIn(raw, m => {
      var value: Option[String] = env.get(m.group(1))
      val chain = Option(m.group(2)).getOrElse("")
      if (chain.nonEmpty) {
        // the filter matches must tile the whole chain (whitespace-only
        // gaps) — a partially-matched arg list, e.g. default(1, true),
        // must fail, not silently drop its tail
        var pos = 0
        for (f <- filterPat.findAllMatchIn(chain)) {
          if (chain.substring(pos, f.start).trim.nonEmpty)
            failT(s"malformed filter chain '${chain.trim}'")
          pos = f.end
          val arg =
            if (f.group(2) != null) Some(f.group(2))
            else if (f.group(3) != null) Some(f.group(3))
            else None
          (f.group(1), arg) match {
            case ("upper", None) =>
              value = Some(value.getOrElse("")
                .toUpperCase(java.util.Locale.ROOT))
            case ("lower", None) =>
              value = Some(value.getOrElse("")
                .toLowerCase(java.util.Locale.ROOT))
            case ("trim", None) => value = Some(value.getOrElse("").strip)
            case ("default", Some(lit)) => value = Some(value.getOrElse(lit))
            case ("default", None) =>
              failT("default requires a quoted literal argument")
            case (name, Some(_)) =>
              failT(s"filter '$name' takes no argument")
            case (name, None) => failT(s"unsupported filter '$name'")
          }
        }
        if (chain.substring(pos).trim.nonEmpty)
          failT(s"malformed filter chain '${chain.trim}'")
      }
      java.util.regex.Matcher.quoteReplacement(value.getOrElse(""))
    })
    out
  }

  /** Full template render: statements ({% if %} blocks, {% for %} loops)
    * and `{{VAR}}` substitution in ONE recursive-descent pass, each text
    * region substituted exactly once with the variables in scope at that
    * point — so a dropped branch's `{{VAR}}` references never render, a
    * loop variable is visible only inside its body (and shadows an
    * environment variable of the same name, Jinja scoping), and an env
    * VALUE containing `{{...}}` is never re-rendered (Jinja treats
    * substituted values as plain text, not templates).
    *
    * Jinja2-semantics subset (reference renders through full Jinja2,
    * weiser/loader/config.py:70-74):
    *   - `{% if EXPR %}` / `{% elif EXPR %}` / `{% else %}` / `{% endif %}`
    *     nested arbitrarily; EXPR is `VAR` (Jinja string truthiness:
    *     defined AND non-empty), `not EXPR`, or `VAR == 'lit'` /
    *     `VAR != "lit"` with exactly-paired quotes — compound expressions
    *     (and/or, mixed quotes, trailing tokens) fail loudly instead of
    *     silently mis-evaluating.
    *   - `{% for X in VAR.split('sep') %}body{% endfor %}` and
    *     `{% for X in ['a', "b"] %}body{% endfor %}` — the
    *     one-check-per-list-entry pattern. split follows Python
    *     semantics exactly ("" splits to [""], empty fields kept); an
    *     undefined source VAR fails loudly (Jinja raises on
    *     undefined.split too, it does not silently skip the loop).
    *   - `{% set X = RHS %}` with RHS a quoted literal or a variable with
    *     an optional filter chain, Jinja scoping semantics: `if` blocks
    *     introduce NO scope (a set in the taken branch persists past the
    *     endif; sets in untaken branches never apply), `for` bodies DO
    *     (loop-body sets don't leak out), and a set is visible to every
    *     later expression, condition, and loop source in its scope.
    *   - every branch's condition and body are PARSED (validated) whether
    *     or not taken — Jinja semantics: syntax errors don't hide in dead
    *     branches or empty loops.
    * Any other statement — macro/`{%-` trim tags — fails
    * loudly with the statement named, and a stray un-tokenized `{%` in
    * the text (e.g. an unclosed or newline-split tag the regex missed)
    * fails too: an unrendered statement silently parsed as YAML text is
    * exactly the class of config bug this loader refuses to ship.
    */
  def renderTemplate(raw: String, env: Map[String, String] = sys.env): String = {
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
    if (toks.forall(_.isInstanceOf[Text])) return substituteEnv(raw, env)

    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"config template: $msg (supported: {{VAR}}, {% if/elif/else/endif %} " +
        "with not and ==/!= string comparison, " +
        "{% for X in VAR.split(',') %}/{% for X in ['a','b'] %}, " +
        "{% set X = 'lit' %}/{% set X = VAR|filters %})")

    toks.foreach {
      case Text(t) if t.contains("{%") =>
        fail("malformed or unterminated '{%' tag " +
          s"near [${t.substring(t.indexOf("{%")).take(40)}]")
      case _ => ()
    }

    // quote pairs matched exactly and anchored — "ENV == 'a' or X == 'b'"
    // must fail loudly, not full-match with a quote-spanning literal
    val cmpPat =
      "([A-Za-z_][A-Za-z0-9_]*)\\s*(==|!=)\\s*(?:'([^']*)'|\"([^\"]*)\")".r
    /** Parse = validate an if-expression eagerly; returns the evaluator
      * (run only for branches that need deciding, against the scope at
      * evaluation time).
      */
    def parseCond(expr: String): Map[String, String] => Boolean =
      expr.trim match {
        case s if s.startsWith("not ") =>
          val inner = parseCond(s.substring(4)); sc => !inner(sc)
        case cmpPat(v, op, sq, dq) =>
          val lit = if (sq != null) sq else dq
          sc => {
            val value = sc.getOrElse(v, "")
            if (op == "==") value == lit else value != lit
          }
        case v if v.matches("[A-Za-z_][A-Za-z0-9_]*") =>
          sc => sc.get(v).exists(_.nonEmpty)
        case other => fail(s"unsupported {% if %} expression '$other'")
      }

    val forSplitPat =
      ("([A-Za-z_][A-Za-z0-9_]*)\\s+in\\s+([A-Za-z_][A-Za-z0-9_]*)" +
        "\\.split\\(\\s*(?:'([^']*)'|\"([^\"]*)\")\\s*\\)").r
    val forListPat = "([A-Za-z_][A-Za-z0-9_]*)\\s+in\\s+\\[(.*)\\]".r
    val listItemPat = "\\s*(?:'([^']*)'|\"([^\"]*)\")\\s*".r
    /** `live = false` inside an UNTAKEN {% if %} branch (round-7 ADVICE
      * fix): the spec's SYNTAX is still validated eagerly — an
      * unsupported expression in a dead branch must fail — but the
      * undefined-source lookup is deferred to live evaluation, so a
      * Jinja-legal guarded template like
      * `{% if HAS_X %}{% for t in X.split(',') %}...{% endif %}` with X
      * undefined renders fine (the dead body is parsed once with zero
      * iterations).
      */
    def parseFor(spec: String, scope: Map[String, String],
                 live: Boolean): (String, Seq[String]) =
      spec.trim match {
        case forSplitPat(x, src, sq, dq) =>
          val sep = if (sq != null) sq else dq
          scope.get(src) match {
            case Some(value) =>
              // Python str.split: "" -> [""], empty fields kept
              (x, value.split(java.util.regex.Pattern.quote(sep), -1).toSeq)
            case None if !live => (x, Seq.empty)
            case None =>
              fail(s"{% for %} over undefined variable '$src'")
          }
        case forListPat(x, items) =>
          val parts =
            if (items.trim.isEmpty) Seq.empty
            else items.split(",", -1).toSeq.map {
              case listItemPat(sq, dq) => if (sq != null) sq else dq
              case bad => fail(s"unsupported {% for %} list item '$bad'")
            }
          (x, parts)
        case other => fail(s"unsupported {% for %} expression '$other'")
      }

    // {% set X = RHS %}: RHS is a quoted literal (exact pairs) or a
    // variable with an optional filter chain — evaluated through
    // substituteEnv so filter semantics (incl. undefined -> "") are the
    // single source of truth
    val setLitPat =
      "([A-Za-z_][A-Za-z0-9_]*)\\s*=\\s*(?:'([^']*)'|\"([^\"]*)\")".r
    val setVarPat =
      ("([A-Za-z_][A-Za-z0-9_]*)\\s*=\\s*" +
        "([A-Za-z_][A-Za-z0-9_]*(?:\\s*\\|[^=]*)?)").r
    def parseSet(spec: String,
                 scope: Map[String, String]): (String, String) =
      spec.trim match {
        case setLitPat(x, sq, dq) => (x, if (sq != null) sq else dq)
        case setVarPat(x, rhs)    => (x, substituteEnv(s"{{$rhs}}", scope))
        case other => fail(s"unsupported {% set %} expression '$other'")
      }

    var i = 0
    // if blocks introduce NO scope in Jinja: the taken branch's sets
    // persist past the endif, so parseIf returns (body, post-if scope);
    // untaken branches are still parsed (validated, sets computed) but
    // their scope is discarded
    def parseIf(firstCond: String, scope: Map[String, String],
                live: Boolean): (String, Map[String, String]) = {
      var result: Option[(String, Map[String, String])] = None
      var cond = parseCond(firstCond)
      var inElse = false
      while (true) {
        // untaken branches still parse (structure + expression syntax
        // validated) but evaluate dead: their {% for %} sources may be
        // legally undefined (round-7 ADVICE fix)
        val taken = result.isEmpty && (inElse || cond(scope))
        val (body, stop, sc) =
          parseBlock(scope, Set("elif", "else", "endif"), live && taken)
        if (taken) result = Some((body, sc))
        stop match {
          case None => fail("unterminated {% if %} (missing {% endif %})")
          case Some(s) =>
            s.split("\\s+", 2).toList match {
              case "endif" :: _ => return result.getOrElse(("", scope))
              case "elif" :: rest =>
                if (inElse) fail("{% elif %} after {% else %}")
                // parse (validate) EVERY branch condition, taken or not —
                // an unsupported expression in a dead elif must not pass
                cond = parseCond(rest.headOption.filter(_.nonEmpty)
                  .getOrElse(fail("{% elif %} without an expression")))
              case "else" :: _ =>
                if (inElse) fail("duplicate {% else %}")
                inElse = true
              case _ => fail(s"unexpected statement '{% $s %}' inside if")
            }
        }
      }
      ("", scope) // unreachable
    }
    // renders until a terminator in stopKws (returned, consumed) or end of
    // input; nested ifs/fors recurse; returns the scope as of the
    // terminator so a {% set %} is visible to the rest of its block
    def parseBlock(scope: Map[String, String], stopKws: Set[String],
                   live: Boolean = true)
        : (String, Option[String], Map[String, String]) = {
      val sb = new StringBuilder
      var sc = scope
      while (i < toks.length) {
        toks(i) match {
          case Text(s) => sb ++= substituteEnv(s, sc); i += 1
          case Stmt(s) =>
            val kw = s.split("\\s+", 2)(0)
            if (stopKws.contains(kw)) {
              i += 1
              return (sb.toString, Some(s), sc)
            }
            kw match {
              case "if" =>
                i += 1
                val cond = s.split("\\s+", 2).lift(1)
                  .getOrElse(fail("{% if %} without an expression"))
                val (body, sc2) = parseIf(cond, sc, live)
                sb ++= body
                sc = sc2
              case "for" =>
                i += 1
                val spec = s.split("\\s+", 2).lift(1)
                  .getOrElse(fail("{% for %} without an expression"))
                val (x, items) = parseFor(spec, sc, live)
                val bodyStart = i
                // for bodies DO introduce a scope (Jinja): loop-body sets
                // are discarded at endfor
                def once(item: String): String = {
                  i = bodyStart
                  val (body, stop, _) = parseBlock(sc + (x -> item),
                    Set("endfor"), live)
                  if (stop.isEmpty)
                    fail("unterminated {% for %} (missing {% endfor %})")
                  body
                }
                if (items.isEmpty) once("") // parse the body anyway
                else items.foreach(item => sb ++= once(item))
              case "set" =>
                i += 1
                val spec = s.split("\\s+", 2).lift(1)
                  .getOrElse(fail("{% set %} without an expression"))
                val (x, value) = parseSet(spec, sc)
                sc = sc + (x -> value)
              case "elif" | "else" | "endif" =>
                fail(s"'{% $s %}' without a matching {% if %}")
              case "endfor" =>
                fail(s"'{% $s %}' without a matching {% for %}")
              case other =>
                fail(s"unsupported statement '{% $s %}'")
            }
        }
      }
      (sb.toString, None, sc)
    }
    parseBlock(env, Set.empty)._1
  }

  /** Tag tokenizer — DOTALL: a legal Jinja tag may contain newlines; a
    * non-dotall `.` would leave it untokenized as silent YAML text.
    */
  private val stmtPat = "(?s)\\{%\\s*(.*?)\\s*%\\}".r

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
