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

  test("Jinja conditional subset: if/elif/else, ==/!=, not, nesting, " +
    "Jinja truthiness; other statements fail loudly") {
    def r(tpl: String, env: (String, String)*): String =
      ConfigLoader.renderTemplate(tpl, env.toMap)
    // truthiness: defined AND non-empty (Jinja string semantics — the
    // string "false" is TRUTHY, exactly like Jinja)
    assert(r("{% if X %}yes{% endif %}", "X" -> "1") == "yes")
    assert(r("{% if X %}yes{% endif %}") == "")
    assert(r("{% if X %}yes{% endif %}", "X" -> "") == "")
    assert(r("{% if X %}yes{% else %}no{% endif %}", "X" -> "false") == "yes")
    assert(r("{% if not X %}off{% endif %}") == "off")
    // comparisons + elif chain
    val tpl = "{% if ENV == 'prod' %}P{% elif ENV == 'dev' %}D{% else %}?{% endif %}"
    assert(r(tpl, "ENV" -> "prod") == "P")
    assert(r(tpl, "ENV" -> "dev") == "D")
    assert(r(tpl, "ENV" -> "test") == "?")
    assert(r("{% if ENV != \"prod\" %}np{% endif %}", "ENV" -> "dev") == "np")
    // nesting + a dropped branch's {{VAR}} must NOT render
    assert(r("{% if A %}{% if B %}ab{% else %}a{% endif %}{% endif %}",
      "A" -> "x") == "a")
    assert(r("{% if A %}{{MISSING_VAR}}{% else %}ok{% endif %}") == "ok")
    // vars still substitute in taken branches and plain text
    assert(r("v={{V}} {% if V %}({{V}}){% endif %}", "V" -> "7") == "v=7 (7)")
    // loud failures: unsupported statements, dangling/unterminated blocks
    for (bad <- Seq("{% for x in xs %}{% endfor %}", "{% set x = 1 %}",
      "{% endif %}", "{% if X %}open", "{% if %}y{% endif %}",
      "{% if f(x) %}y{% endif %}",
      // round-6 ADVICE regressions — each of these previously either
      // silently mis-evaluated or passed through as silent text:
      "{% if ENV == 'a' or ENV == 'b' %}y{% endif %}", // greedy-quote compound
      "{% if ENV == 'a\" %}y{% endif %}",              // mixed quote pair
      "{% if X %}y{% elif f(x) %}z{% endif %}",        // dead-elif validation
      "{% if X %}y{% endif", // unterminated tag -> stray '{%' in text
      "{% endfor %}", "{% for x in ['a'] %}open",
      "{% for x in MISSING_SRC.split(',') %}y{% endfor %}")) {
      val e = intercept[IllegalArgumentException](r(bad, "X" -> "1"))
      assert(e.getMessage.contains("config template"), s"$bad -> $e")
    }
    // a legal Jinja tag containing a newline must tokenize (dotall), not
    // pass through as YAML text
    assert(r("{% if ENV\n   == 'prod' %}P{% endif %}", "ENV" -> "prod") == "P")
    // end-to-end: a conditional checks block through load()
    val tmp = java.nio.file.Files.createTempDirectory("cfgjinja")
    java.nio.file.Files.writeString(tmp.resolve("c.yaml"),
      """checks:
        |  - {name: always, dataset: t, type: row_count}
        |{% if GRAFT_TPL_STRICT == 'on' %}
        |  - {name: strict only, dataset: t, type: row_count}
        |{% endif %}
        |""".stripMargin)
    val on = ConfigLoader.load(tmp.resolve("c.yaml").toString,
      Map("GRAFT_TPL_STRICT" -> "on"))
    val off = ConfigLoader.load(tmp.resolve("c.yaml").toString, Map.empty)
    assert(on.checks.map(_.name) == Seq("always", "strict only"))
    assert(off.checks.map(_.name) == Seq("always"))
  }

  test("Jinja for-loop subset: split/list sources, nesting, scoping, " +
    "Python split semantics; end-to-end through load()") {
    def r(tpl: String, env: (String, String)*): String =
      ConfigLoader.renderTemplate(tpl, env.toMap)
    // env-driven list (the real config use) + literal list
    assert(r("{% for t in TABLES.split(',') %}[{{t}}]{% endfor %}",
      "TABLES" -> "a,b,c") == "[a][b][c]")
    assert(r("{% for t in ['x', \"y\"] %}{{t}};{% endfor %}") == "x;y;")
    assert(r("{% for t in [] %}{{t}};{% endfor %}") == "")
    // Python str.split semantics, exactly: "" -> [""], empty fields kept
    assert(r("{% for t in E.split(',') %}[{{t}}]{% endfor %}", "E" -> "")
      == "[]")
    assert(r("{% for t in T.split(',') %}[{{t}}]{% endfor %}",
      "T" -> "a,,b,") == "[a][][b][]")
    // multi-char separator is quoted literally, not regex
    assert(r("{% for t in T.split('|.|') %}[{{t}}]{% endfor %}",
      "T" -> "a|.|b") == "[a][b]")
    // nesting + conditions over the loop var + shadowing an env var
    assert(r("{% for a in X.split(',') %}{% for b in Y.split(',') %}" +
      "{{a}}{{b}} {% endfor %}{% endfor %}",
      "X" -> "1,2", "Y" -> "p,q") == "1p 1q 2p 2q ")
    assert(r("{% for t in T.split(',') %}" +
      "{% if t == 'b' %}!{% else %}{{t}}{% endif %}{% endfor %}",
      "T" -> "a,b,c") == "a!c")
    assert(r("{{t}}/{% for t in ['in'] %}{{t}}{% endfor %}/{{t}}",
      "t" -> "out") == "out/in/out")
    // an empty loop still validates its body (Jinja: syntax errors do not
    // hide in never-executed bodies)
    val dead = intercept[IllegalArgumentException](
      r("{% for t in [] %}{% bogus %}{% endfor %}"))
    assert(dead.getMessage.contains("bogus"))
    // end-to-end: one check per list entry through load()
    val tmp = java.nio.file.Files.createTempDirectory("cfgfor")
    java.nio.file.Files.writeString(tmp.resolve("loop.yaml"),
      """checks:
        |{% for t in GRAFT_TPL_TABLES.split(',') %}
        |  - {name: rc {{t}}, dataset: {{t}}, type: row_count}
        |{% endfor %}
        |""".stripMargin)
    val cfg = ConfigLoader.load(tmp.resolve("loop.yaml").toString,
      Map("GRAFT_TPL_TABLES" -> "pages,events,docs"))
    assert(cfg.checks.map(_.name) == Seq("rc pages", "rc events", "rc docs"))
    assert(cfg.checks.map(_.dataset) ==
      Seq(Seq("pages"), Seq("events"), Seq("docs")))
  }

  test("{% for %} in an UNTAKEN branch may reference an undefined source " +
    "(deferred lookup — Jinja parity), while dead-branch syntax is still " +
    "validated and a LIVE undefined source still fails by name") {
    def r(tpl: String, env: (String, String)*): String =
      ConfigLoader.renderTemplate(tpl, env.toMap)
    // Jinja-legal guarded loop: X undefined, guard false -> renders fine
    // (previously rejected: dead branches executed parseFor's lookup)
    assert(r("{% if HAS_X %}{% for t in X.split(',') %}{{t}}{% endfor %}" +
      "{% endif %}ok") == "ok")
    // guard true with X defined still iterates
    assert(r("{% if HAS_X %}{% for t in X.split(',') %}[{{t}}]" +
      "{% endfor %}{% endif %}", "HAS_X" -> "1", "X" -> "a,b") == "[a][b]")
    // nested: a dead outer if shields an inner guarded for too
    assert(r("{% if NO %}{% if YES %}{% for t in X.split(',') %}x" +
      "{% endfor %}{% endif %}{% endif %}done") == "done")
    // dead-branch SYNTAX is still validated (unsupported spec fails loud)
    val bad = intercept[IllegalArgumentException](
      r("{% if HAS_X %}{% for t in 1 + 2 %}x{% endfor %}{% endif %}"))
    assert(bad.getMessage.contains("unsupported"))
    // a LIVE for over an undefined source still fails by name
    val undef = intercept[IllegalArgumentException](
      r("{% for t in X.split(',') %}{{t}}{% endfor %}"))
    assert(undef.getMessage.contains("undefined"))
  }

  test("Jinja filter subset: upper/lower/trim/default chains, undefined " +
    "semantics, loud failure on everything else") {
    def r(tpl: String, env: (String, String)*): String =
      ConfigLoader.renderTemplate(tpl, env.toMap)
    // basics + chaining (left to right)
    assert(r("{{X|upper}}", "X" -> "abc") == "ABC")
    assert(r("{{X|lower}}", "X" -> "AbC") == "abc")
    assert(r("{{X|trim}}", "X" -> "  a b  ") == "a b")
    assert(r("{{ X | trim | upper }}", "X" -> " ab ") == "AB")
    // Jinja default-environment undefined semantics: undefined renders ""
    // through string filters; default replaces only the UNDEFINED value
    // (a defined-but-empty value is kept); filters after default see the
    // defaulted value
    assert(r("{{UNDEF|upper}}") == "")
    assert(r("{{UNDEF|default('d')}}") == "d")
    assert(r("{{X|default('d')}}", "X" -> "") == "")
    assert(r("{{X|default('d')}}", "X" -> "v") == "v")
    assert(r("{{UNDEF|default('d')|upper}}") == "D")
    assert(r("{{X|default(\"d\")}}", "X" -> "v") == "v")
    // filters compose with statements (loop var in scope)
    assert(r("{% for t in ['a','b'] %}{{t|upper}};{% endfor %}") == "A;B;")
    // a substituted env VALUE containing '{{' is plain text, never
    // re-rendered and never flagged by the unsupported-expression guard
    assert(r("{{X}}", "X" -> "literal {{Y}} text") == "literal {{Y}} text")
    // loud failures: unknown filter, bad args, unsupported expressions —
    // each previously passed through as SILENT literal text
    for (bad <- Seq("{{X|join(',')}}", "{{X|default}}", "{{X|upper('a')}}",
      "{{X|default(1, true)}}", "{{ 1 + 2 }}", "{{bad-name}}",
      "{{X.method()}}", "{{ X | }}")) {
      val e = intercept[IllegalArgumentException](r(bad, "X" -> "v"))
      assert(e.getMessage.contains("config template"), s"$bad -> $e")
    }
    // end-to-end through load(): defaulted var inside a check name
    val tmp = java.nio.file.Files.createTempDirectory("cfgfilter")
    java.nio.file.Files.writeString(tmp.resolve("f.yaml"),
      "checks:\n  - {name: rc {{GRAFT_TPL_SUFFIX|default('base')|upper}}, " +
        "dataset: t, type: row_count}\n")
    val withVar = ConfigLoader.load(tmp.resolve("f.yaml").toString,
      Map("GRAFT_TPL_SUFFIX" -> "eu"))
    val without = ConfigLoader.load(tmp.resolve("f.yaml").toString, Map.empty)
    assert(withVar.checks.map(_.name) == Seq("rc EU"))
    assert(without.checks.map(_.name) == Seq("rc BASE"))
  }

  test("Jinja set subset: literal/var/filter RHS, if-blocks share scope, " +
    "for-bodies don't, loud failure on unsupported RHS") {
    def r(tpl: String, env: (String, String)*): String =
      ConfigLoader.renderTemplate(tpl, env.toMap)
    // literal, var, filter-chain RHS; set feeds later expressions,
    // conditions, and loop sources
    assert(r("{% set x = 'v' %}{{x}}") == "v")
    assert(r("{% set x = SRC %}{{x}}", "SRC" -> "s") == "s")
    assert(r("{% set x = SRC|upper|trim %}{{x}}!", "SRC" -> " ab ") == "AB!")
    assert(r("{% set x = UNDEF|default('d') %}{{x}}") == "d")
    assert(r("{% set x = UNDEF %}[{{x}}]") == "[]") // Jinja undefined -> ""
    assert(r("{% set x = 'p' %}{% if x == 'p' %}Y{% else %}N{% endif %}")
      == "Y")
    assert(r("{% set l = 'a,b' %}{% for t in l.split(',') %}{{t}};" +
      "{% endfor %}") == "a;b;")
    // rebinding: later set wins; set shadows an env var of the same name
    assert(r("{% set x = 'a' %}{% set x = 'b' %}{{x}}") == "b")
    assert(r("{% set X = 'mine' %}{{X}}", "X" -> "env") == "mine")
    // Jinja scoping: if blocks introduce NO scope (taken-branch set
    // persists past endif; untaken branch's set never applies) ...
    assert(r("{% if F %}{% set x = 't' %}{% else %}{% set x = 'e' %}" +
      "{% endif %}{{x}}", "F" -> "1") == "t")
    assert(r("{% if F %}{% set x = 't' %}{% else %}{% set x = 'e' %}" +
      "{% endif %}{{x}}") == "e")
    assert(r("{% if F %}{% set x = 't' %}{% endif %}[{{x}}]") == "[]")
    // ... but for bodies DO (loop-body set visible inside the iteration,
    // discarded at endfor — and the loop VAR itself stays scoped)
    assert(r("{% for t in ['a'] %}{% set y = t|upper %}{{y}}{% endfor %}" +
      "[{{y}}]") == "A[]")
    // a set in a dead branch is still VALIDATED (syntax errors don't hide)
    intercept[IllegalArgumentException](
      r("{% if F %}{% set x = 1 + 2 %}{% endif %}"))
    // loud failures: missing/garbage RHS, bad names, trailing tokens
    for (bad <- Seq("{% set x %}", "{% set x = %}", "{% set 1x = 'a' %}",
      "{% set x = 'a'|upper %}", "{% set x = VAR junk %}",
      "{% set x = VAR|upper junk %}", "{% set x = [1,2] %}")) {
      val e = intercept[IllegalArgumentException](r(bad, "VAR" -> "v"))
      assert(e.getMessage.contains("config template"), s"$bad -> $e")
    }
    // end-to-end through load(): set-derived check name
    val tmp = java.nio.file.Files.createTempDirectory("cfgset")
    java.nio.file.Files.writeString(tmp.resolve("s.yaml"),
      "{% set env = GRAFT_TPL_ENV|default('dev')|upper %}\n" +
        "checks:\n  - {name: rc {{env}}, dataset: t, type: row_count}\n")
    assert(ConfigLoader.load(tmp.resolve("s.yaml").toString,
      Map("GRAFT_TPL_ENV" -> "prod")).checks.map(_.name) == Seq("rc PROD"))
    assert(ConfigLoader.load(tmp.resolve("s.yaml").toString,
      Map.empty).checks.map(_.name) == Seq("rc DEV"))
  }

  test("Jinja renderer: random nested templates (if/for/set) match a " +
    "reference evaluation (property)") {
    val env = Map("A" -> "1", "B" -> "", "C" -> "prod", "D" -> "x",
      "L1" -> "a,b", "L2" -> "", "L3" -> "p,,q")
    // build (template, referenceEval) pairs recursively: the reference
    // side is a structural evaluator over the in-scope variables, never
    // the code under test. The eval threads Scope => (String, Scope) so
    // {% set %} visibility to RIGHT SIBLINGS, if-blocks sharing scope,
    // and for-bodies discarding it are all independently re-derived;
    // scope-dependent eval also covers loop-variable shadowing and
    // conditions over loop/set vars.
    type Scope = Map[String, String]
    type Eval = Scope => (String, Scope)
    def truthyRef(sc: Scope, v: String) = sc.get(v).exists(_.nonEmpty)
    val setNames = Seq("s0", "s1")
    def build(rnd: scala.util.Random, depth: Int,
              loopVars: List[String]): (String, Eval) = {
      rnd.nextInt(if (depth >= 4) 2 else 7) match {
        case 0 => val t = "t" + rnd.nextInt(100) + " "; (t, sc => (t, sc))
        case 1 =>
          val cands = Seq("A", "B", "C", "MISSING") ++ setNames ++ loopVars
          val v = cands(rnd.nextInt(cands.length))
          (s"{{$v}}", sc => (sc.getOrElse(v, ""), sc))
        case 2 =>
          val (t1, e1) = build(rnd, depth + 1, loopVars)
          val (t2, e2) = build(rnd, depth + 1, loopVars)
          (t1 + t2, sc => {
            val (o1, sc1) = e1(sc)
            val (o2, sc2) = e2(sc1) // set in t1 visible to t2
            (o1 + o2, sc2)
          })
        case 5 =>
          // a loop: env-driven split or literal list, nested bodies may
          // reference (and shadow) the loop var; body sets are DISCARDED
          // at endfor (Jinja loop scope)
          val x = s"v${loopVars.length}"
          val (srcTpl, items): (String, Scope => Seq[String]) =
            if (rnd.nextBoolean()) {
              val src = Seq("L1", "L2", "L3")(rnd.nextInt(3))
              (s"$src.split(',')", sc => sc(src).split(",", -1).toSeq)
            } else {
              val lits = Seq.fill(rnd.nextInt(3))("i" + rnd.nextInt(10))
              (lits.map("'" + _ + "'").mkString("[", ", ", "]"),
                _ => lits)
            }
          val (t1, e1) = build(rnd, depth + 1, x :: loopVars)
          (s"{% for $x in $srcTpl %}$t1{% endfor %}",
            sc => (items(sc).map(item => e1(sc + (x -> item))._1).mkString,
              sc))
        case 6 =>
          // {% set %}: literal or variable(+filter) RHS; renders nothing,
          // mutates the scope for what follows in the same block
          val x = setNames(rnd.nextInt(setNames.length))
          rnd.nextInt(3) match {
            case 0 =>
              val lit = "w" + rnd.nextInt(10)
              (s"{% set $x = '$lit' %}", sc => ("", sc + (x -> lit)))
            case 1 =>
              val cands = Seq("A", "C", "MISSING") ++ setNames ++ loopVars
              val src = cands(rnd.nextInt(cands.length))
              (s"{% set $x = $src %}",
                sc => ("", sc + (x -> sc.getOrElse(src, ""))))
            case _ =>
              val src = Seq("C", "D", "MISSING")(rnd.nextInt(3))
              (s"{% set $x = $src|upper %}",
                sc => ("", sc + (x -> sc.getOrElse(src, "")
                  .toUpperCase(java.util.Locale.ROOT))))
          }
        case _ =>
          val (cond, truth): (String, Scope => Boolean) = rnd.nextInt(6) match {
            case 0 => val v = Seq("A", "B", "MISSING")(rnd.nextInt(3))
              (v, truthyRef(_, v))
            case 1 => val v = Seq("A", "B")(rnd.nextInt(2))
              (s"not $v", sc => !truthyRef(sc, v))
            case 2 => val lit = Seq("prod", "dev")(rnd.nextInt(2))
              (s"C == '$lit'", sc => sc("C") == lit)
            case 3 => val lit = Seq("prod", "dev")(rnd.nextInt(2))
              (s"C != '$lit'", sc => sc("C") != lit)
            case 4 =>
              val v = setNames(rnd.nextInt(setNames.length))
              (v, truthyRef(_, v)) // condition over a set var
            case _ if loopVars.nonEmpty =>
              val v = loopVars(rnd.nextInt(loopVars.length))
              val lit = Seq("a", "b", "i1")(rnd.nextInt(3))
              (s"$v == '$lit'", sc => sc.getOrElse(v, "") == lit)
            case _ => ("A", truthyRef(_, "A"))
          }
          val (t1, e1) = build(rnd, depth + 1, loopVars)
          // if blocks share scope: the TAKEN branch's sets persist
          if (rnd.nextBoolean()) {
            val (t2, e2) = build(rnd, depth + 1, loopVars)
            (s"{% if $cond %}$t1{% else %}$t2{% endif %}",
              sc => if (truth(sc)) e1(sc) else e2(sc))
          } else
            (s"{% if $cond %}$t1{% endif %}",
              sc => if (truth(sc)) e1(sc) else ("", sc))
      }
    }
    (0 until 500).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val (tpl, expected) = build(rnd, 0, Nil)
      val got = ConfigLoader.renderTemplate(tpl, env)
      assert(got == expected(env)._1,
        s"seed=$seed template=$tpl got=$got expected=${expected(env)._1}")
    }
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

  test("diamond includes load each file exactly once") {
    // a -> {b, c}; b -> d; c -> d : d's checks must appear ONCE
    val tmp = java.nio.file.Files.createTempDirectory("cfgdiamond")
    java.nio.file.Files.writeString(tmp.resolve("a.yaml"),
      "checks:\n  - {name: a, dataset: t, type: row_count}\nincludes: [b.yaml, c.yaml]\n")
    java.nio.file.Files.writeString(tmp.resolve("b.yaml"),
      "checks:\n  - {name: b, dataset: t, type: row_count}\nincludes: [d.yaml]\n")
    java.nio.file.Files.writeString(tmp.resolve("c.yaml"),
      "checks:\n  - {name: c, dataset: t, type: row_count}\nincludes: [d.yaml]\n")
    java.nio.file.Files.writeString(tmp.resolve("d.yaml"),
      "checks:\n  - {name: d, dataset: t, type: row_count}\n")
    val cfg = ConfigLoader.load(tmp.resolve("a.yaml").toString)
    assert(cfg.checks.map(_.name).sorted == Seq("a", "b", "c", "d"))
  }

  test("connections, slack_url and per-check datasource parse from YAML " +
    "(reference models.py:81,207-213)") {
    val cfg = ConfigLoader.parseYaml(
      """version: 1
        |connections:
        |  - name: metricstore
        |    type: metricstore
        |    uri: /tmp/metrics
        |slack_url: https://hooks.example.com/T000/B000
        |checks:
        |  - {name: everywhere, dataset: t, type: row_count}
        |  - {name: pinned_one, dataset: t, type: row_count, datasource: ds1}
        |  - name: pinned_two
        |    dataset: t
        |    type: row_count
        |    datasource: [ds1, ds2]
        |""".stripMargin)
    assert(cfg.connections ==
      Seq(Connection("metricstore", "metricstore", "/tmp/metrics")))
    assert(cfg.slackUrl.contains("https://hooks.example.com/T000/B000"))
    assert(cfg.checks.map(_.datasource) ==
      Seq(Nil, Seq("ds1"), Seq("ds1", "ds2")))
  }

  test(".env file feeds templating; process env wins (main.py:52-59)") {
    val tmp = java.nio.file.Files.createTempDirectory("dotenv")
    java.nio.file.Files.writeString(tmp.resolve(".env"),
      "# comment line\nexport GRAFT_DOTENV_TABLE=pages\n" +
        "GRAFT_DOTENV_QUOTED=\"hello world\"\nNOT_A_LINE\nPATH=ignored\n")
    java.nio.file.Files.writeString(tmp.resolve("c.yaml"),
      "checks:\n  - {name: x, dataset: '{{GRAFT_DOTENV_TABLE}}', type: row_count,\n" +
        "     filter: \"t = '{{GRAFT_DOTENV_QUOTED}}'\"}\n")
    val env = ConfigLoader.envForConfig(tmp.resolve("c.yaml").toString)
    assert(env("GRAFT_DOTENV_TABLE") == "pages")
    assert(env("GRAFT_DOTENV_QUOTED") == "hello world")
    // the process env value wins over the dotenv one
    assert(env("PATH") == sys.env("PATH"))
    val cfg = ConfigLoader.load(tmp.resolve("c.yaml").toString, env)
    assert(cfg.checks.head.dataset == Seq("pages"))
    assert(cfg.checks.head.filter.contains("t = 'hello world'"))
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

  private lazy val eventsDir: String = {
    // streaming readStream needs a directory of parquet part-files
    val tmp = java.nio.file.Files.createTempDirectory("events").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").repartition(3)
      .write.mode("overwrite").parquet(tmp)
    tmp
  }

  test("streaming quality filter: parity with batch, exactly-once verdicts, " +
    "checkpointed restart processes only new files") {
    import graft.sources.Pages
    val tmp = java.nio.file.Files.createTempDirectory("sqf").toString
    val runTime = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val all = Pages.load(spark, "/root/testdata/sf0.001").cache()
    val first = all.filter(org.apache.spark.sql.functions.col("url").endsWith("0") || org.apache.spark.sql.functions.col("url").endsWith("1"))
    val second = all.filter(!(org.apache.spark.sql.functions.col("url").endsWith("0") || org.apache.spark.sql.functions.col("url").endsWith("1")))
    first.write.parquet(s"$tmp/in") // initial files

    def runStream(): Unit = {
      val q = graft.streaming.EventStream.streamingQualityFilter(spark,
        s"$tmp/in", s"$tmp/out", s"$tmp/ckpt", s"$tmp/metrics", "runS", runTime)
      q.processAllAvailable(); q.stop()
    }
    runStream()
    val afterFirst = spark.read.parquet(s"$tmp/out").count()
    assert(afterFirst == first.count())

    // restart with the same checkpoint after new files arrive: only the
    // new files are processed, nothing is duplicated
    second.write.mode("append").parquet(s"$tmp/in")
    runStream()
    val streamed = spark.read.parquet(s"$tmp/out")
      .select("url", "keep", "scrubbed_text")
      .collect().map(_.toString).sorted.toSeq
    val direct = graft.operators.QualityFilter.run(all)
      .select("url", "keep", "scrubbed_text")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == direct)

    // lineage metrics: ids unique (idempotent per batch), buckets covered
    val m = spark.read.parquet(s"$tmp/metrics")
    val ids = m.select("id").collect().map(_.getString(0))
    assert(ids.length == ids.distinct.length && ids.nonEmpty)
    // per-rule fail counts summed over batches equal the batch-mode run
    val streamedFails = m.groupBy("name")
      .agg(org.apache.spark.sql.functions.sum("actual_value").as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val directFails = graft.operators.QualityFilter.partitionMetrics(
        graft.operators.QualityFilter.run(all),
        graft.operators.QualityFilter.defaultRules, "x", runTime)
      .groupBy("name")
      .agg(org.apache.spark.sql.functions.sum("actual_value").as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamedFails == directFails)
    all.unpersist()
  }

  test("streaming content dedup: explicit keep decisions, min-url wins " +
    "within a batch, first-seen wins across restarts (checkpointed state)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scd").toString
    def pages(rows: Seq[(String, String)]) =
      rows.toDF("url", "text")
        .select(col("url"),
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("warc_ts"),
          lit(null).cast("binary").as("html"), col("text"),
          lit("en").as("lang"))
    // batch 1: texts A (x2), B, C
    pages(Seq("u3" -> "text A", "u7" -> "text A", "u5" -> "text B",
      "u9" -> "text C")).write.parquet(s"$tmp/in")
    val d1 = graft.streaming.EventStream.streamingContentDedup(spark,
      s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
      .select("url", "keep")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // min url wins within the batch — same rule as the batch operator
    assert(d1 == Map("u3" -> true, "u7" -> false, "u5" -> true, "u9" -> true))
    // single-batch stream == Dedup.exact on the same input
    val batch = graft.operators.Dedup.exact(
      pages(Seq("u3" -> "text A", "u7" -> "text A", "u5" -> "text B",
        "u9" -> "text C")), "text", "url")
      .select("url", "is_dup").collect()
      .map(r => r.getString(0) -> !r.getBoolean(1)).toMap
    assert(d1 == batch)

    // batch 2 after a RESTART: u1 repeats text A with a SMALLER url —
    // first-seen still wins (u1 loses; streams can't revisit history);
    // new text D dedups among its own batch
    pages(Seq("u1" -> "text A", "u2" -> "text D", "u8" -> "text D"))
      .write.mode("append").parquet(s"$tmp/in")
    val all = graft.streaming.EventStream.streamingContentDedup(spark,
      s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
      .select("url", "keep")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // prior decisions are retained (exactly-once batch dirs) and the new
    // batch's rows decide against the checkpointed state
    assert(all == d1 ++ Map("u1" -> false, "u2" -> true, "u8" -> false))
  }

  test("streaming content dedup horizon: retainBatches bounds the state " +
    "consulted; a text recurring past the horizon is re-admitted") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scdh").toString
    def pages(rows: Seq[(String, String)]) =
      rows.toDF("url", "text")
        .select(col("url"),
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("warc_ts"),
          lit(null).cast("binary").as("html"), col("text"),
          lit("en").as("lang"))
    def run(): Map[String, Boolean] =
      graft.streaming.EventStream.streamingContentDedup(spark,
        s"$tmp/in", s"$tmp/out", s"$tmp/ckpt", retainBatches = 1L)
        .select("url", "keep")
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // batch 0 admits the winner; batch 1 (within the 1-batch horizon)
    // drops the duplicate and appends NO new winner for it
    pages(Seq("u3" -> "text A")).write.parquet(s"$tmp/in")
    assert(run() == Map("u3" -> true))
    pages(Seq("u7" -> "text A")).write.mode("append").parquet(s"$tmp/in")
    assert(run() == Map("u3" -> true, "u7" -> false))
    // batch 2: only batch 1's (empty) winners are in the horizon — the
    // batch-0 winner has aged out and duplicates never refreshed it
    // (first-seen horizon, the documented boundary), so the text is
    // RE-ADMITTED as a fresh winner
    pages(Seq("u9" -> "text A")).write.mode("append").parquet(s"$tmp/in")
    assert(run() ==
      Map("u3" -> true, "u7" -> false, "u9" -> true))
  }

  test("streaming SEMANTIC dedup: same-cell cosine duplicates drop, " +
    "first-seen wins across a restart, static corpus-derived cells") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ssd").toString
    val x = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val z = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val w = Seq(0.0f, 0.0f, 1.0f, 0.0f)
    // cells derive from a STATIC source (the committed corpus's centroid
    // metadata in production) — stable across batches and restarts
    val centroidSource = Seq((0L, x), (1L, z), (2L, w))
      .toDF("vec_id", "embedding")
    def run(): Map[Long, Boolean] =
      graft.streaming.EventStream.streamingSemanticDedup(spark,
        s"$tmp/in", s"$tmp/out", s"$tmp/ckpt", centroidSource,
        k = 3, cosineThreshold = 0.95)
        .select("vec_id", "keep")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // batch 1: near-identical pair in one cell + a lone vector
    Seq((10L, x), (11L, Seq(0.999f, 0.01f, 0.0f, 0.0f)), (12L, z))
      .toDF("vec_id", "embedding").write.parquet(s"$tmp/in")
    assert(run() == Map(10L -> true, 11L -> false, 12L -> true))
    // batch 2 after a RESTART: a smaller key repeating x's neighborhood
    // still loses (first-seen wins; streams can't revisit history), a
    // genuinely new direction keeps
    Seq((5L, Seq(0.998f, 0.02f, 0.0f, 0.0f)), (20L, w))
      .toDF("vec_id", "embedding").write.mode("append").parquet(s"$tmp/in")
    assert(run() == Map(10L -> true, 11L -> false, 12L -> true,
      5L -> false, 20L -> true))
    // NOTE deliberately no batch-operator comparison here: semanticDedup
    // derives cells from its INPUT (k centroids sampled from the batch —
    // on a 3-vector batch at k=3 every vector is its own cell, so no
    // pairs form), while the stream's cells are corpus metadata. The two
    // agree when given the same cells — that is what
    // semanticDedupIncremental's empty-corpus degeneracy spec pins.
  }

  test("streaming SEMANTIC dedup hot-cell cap: an over-cap SEEN cell " +
    "keeps its min-key hub, and a later duplicate of the hub still drops") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ssdc").toString
    val x = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val z = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val w = Seq(0.0f, 0.0f, 1.0f, 0.0f)
    val centroidSource = Seq((0L, x), (1L, z), (2L, w))
      .toDF("vec_id", "embedding")
    def run(): Map[Long, Boolean] =
      graft.streaming.EventStream.streamingSemanticDedup(spark,
        s"$tmp/in", s"$tmp/out", s"$tmp/ckpt", centroidSource,
        k = 3, cosineThreshold = 0.95, maxCellSize = 2)
        .select("vec_id", "keep")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // batch 1: FOUR mutually-distinct vectors (pairwise cosine < 0.95)
    // that all land in centroid x's cell — the seen state's cell ends at
    // 4 rows, over maxCellSize = 2, so the batch-vs-seen join of every
    // later batch consults the capped sample, never all four
    Seq((10L, Seq(0.95f, 0.31f, 0.0f, 0.0f)),
        (11L, Seq(0.95f, -0.31f, 0.0f, 0.0f)),
        (12L, Seq(0.95f, 0.0f, 0.31f, 0.0f)),
        (13L, Seq(0.95f, 0.0f, -0.31f, 0.0f)))
      .toDF("vec_id", "embedding").write.parquet(s"$tmp/in")
    assert(run() == Map(10L -> true, 11L -> true, 12L -> true, 13L -> true))
    // batch 2: a near-duplicate of key 10 — the cell's MINIMUM key, which
    // capGroups keeps unconditionally (the stable adoption target) — must
    // still adopt cluster 10 and drop; a fresh direction (cell w) keeps.
    // Deterministic regardless of which of 11/12/13 the hash sample
    // retains, because the duplicate targets the guaranteed-kept hub.
    Seq((20L, Seq(0.951f, 0.312f, 0.0f, 0.0f)), (21L, w))
      .toDF("vec_id", "embedding").write.mode("append").parquet(s"$tmp/in")
    assert(run() == Map(10L -> true, 11L -> true, 12L -> true, 13L -> true,
      20L -> false, 21L -> true))
  }

  test("streaming NEAR-dup dedup: a later near-duplicate (jaccard >= 0.8, " +
    "not byte-equal) is dropped across a restart; decisions agree with " +
    "the batch LSH pipeline") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("snd").toString
    def pages(rows: Seq[(String, String)]) =
      rows.toDF("url", "text")
        .select(col("url"),
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("warc_ts"),
          lit(null).cast("binary").as("html"), col("text"),
          lit("en").as("lang"))
    // 40-word docs: editing the LAST word flips 3 of 38 shingles ->
    // jaccard 35/41 ~ 0.854 >= 0.8 (near-dup, NOT byte-equal); disjoint
    // vocabularies keep unrelated docs at jaccard 0
    def doc(prefix: String, n: Int, last: String): String =
      ((0 until n - 1).map(k => s"$prefix$k") :+ last).mkString(" ")
    val a = doc("alpha", 40, "alpha39")
    val aNear = doc("alpha", 40, "CHANGED") // near-dup of a
    val b = doc("beta", 40, "beta39")
    val bNear = doc("beta", 40, "EDITED")
    val c = doc("gamma", 40, "gamma39")

    // batch 1: a + its near-dup in the SAME batch, plus b
    val batch1 = Seq("u1" -> a, "u5" -> aNear, "u3" -> b)
    pages(batch1).write.parquet(s"$tmp/in")
    val d1 = graft.streaming.EventStream.streamingNearDupDedup(spark,
      s"$tmp/in", s"$tmp/out", s"$tmp/ckpt", jaccardThreshold = 0.8)
      .select("url", "keep")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(d1 == Map("u1" -> true, "u5" -> false, "u3" -> true))

    // batch 2 AFTER A RESTART (new invocation, same checkpoint + state
    // dirs): a near-dup of b arrives later -> dropped against the stored
    // shingle state, NOT byte-equal; an unrelated doc is kept
    val batch2 = Seq("u7" -> bNear, "u9" -> c)
    pages(batch2).write.mode("append").parquet(s"$tmp/in")
    val all = graft.streaming.EventStream.streamingNearDupDedup(spark,
      s"$tmp/in", s"$tmp/out", s"$tmp/ckpt", jaccardThreshold = 0.8)
      .select("url", "keep")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(all == d1 ++ Map("u7" -> false, "u9" -> true))

    // batch-vs-streaming agreement: the batch pipeline over the SAME
    // corpus lands on the same keep set
    val corpus = pages(batch1 ++ batch2)
    val batchKeep = graft.operators.Dedup.dedupDecisions(corpus,
        graft.operators.Dedup.minhashLshDedup(corpus, "url", "text",
          jaccardThreshold = 0.8), "url")
      .select("url", "keep")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(all == batchKeep)

    // exact duplicates flow through the same path (jaccard 1.0): a
    // byte-equal copy of a kept doc arriving in batch 3 is dropped
    pages(Seq("u0" -> c)).write.mode("append").parquet(s"$tmp/in")
    val withExact = graft.streaming.EventStream.streamingNearDupDedup(spark,
      s"$tmp/in", s"$tmp/out", s"$tmp/ckpt", jaccardThreshold = 0.8)
      .select("url", "keep")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // u0 < u9 but u9 was seen FIRST — first-seen wins in the stream
    assert(withExact == all ++ Map("u0" -> false))
  }

  test("stateful streaming dedup equals batch distinct counts") {
    import org.apache.spark.sql.functions._
    val streamed = EventStream.streamingDedup(spark, eventsDir, "dedup_test")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = spark.read.parquet(eventsDir).dropDuplicates("event_id")
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("mapGroupsWithState running totals converge to batch sums") {
    import org.apache.spark.sql.functions._
    val updates = EventStream.runningUserTotals(spark, eventsDir, "totals_test")
    // last update per user == final running total (values positive)
    val streamed = updates.groupBy(col("user_id"))
      .agg(max(col("total")).as("total")).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1e4)).toMap
    val batch = spark.read.parquet(eventsDir).groupBy(col("user_id"))
      .agg(sum(col("value")).as("total")).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1e4)).toMap
    assert(streamed == batch)
  }

  test("native session_window equals the lag/running-sum sessionize, " +
    "batch and streaming") {
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val events = spark2.read.parquet("/root/testdata/sf0.001/events.parquet")
    // canon via unix micros: the batch path keeps the parquet's
    // TIMESTAMP_NTZ while the streaming schema declares TimestampType —
    // same instants (UTC session), different toString renderings
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("user_id"),
          unix_micros(col("session_start").cast("timestamp")),
          unix_micros(col("session_end").cast("timestamp")),
          col("n_events"), col("total_value"))
        .collect().map(_.mkString("|")).toSet
    val viaWindows = canon(EventStream.sessionize(events)
      .drop("session_id"))
    val viaSessionWindow = canon(EventStream.sessionWindowAgg(events))
    assert(viaSessionWindow == viaWindows)
    // streaming twin over the same rows
    val streamed = canon(
      EventStream.streamingSessionWindow(spark2, eventsDir, "sesswin"))
    assert(streamed == viaWindows)
  }

  test("session_window late data: an event arriving after the watermark " +
    "passed its session is dropped, not merged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def write(dir: String, rows: Seq[(Long, String, Long, Double)]): Unit =
      rows.toDF("event_id", "ts_s", "user_id", "value")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select(col("event_id"), col("ts"), col("user_id"),
          lit("t").as("event_type"), col("value"), lit("{}").as("props"))
        .write.mode("append").parquet(dir)
    val dir = java.nio.file.Files.createTempDirectory("latesess").toString
    // batch 1: a two-event session for user 7 at 10:00-10:10, plus a
    // sentinel event far ahead (20:00) that advances the watermark
    // (1h delay -> 19:00), well past the session's end + gap (10:40):
    // the session is emitted and its state evicted
    write(dir, Seq((1L, "2024-01-01 10:00:00", 7L, 1.0),
      (2L, "2024-01-01 10:10:00", 7L, 2.0),
      (3L, "2024-01-01 20:00:00", 99L, 9.0)))
    val q = EventStream.streamingSessionWindowAppend(spark, dir, "latesess")
    try {
      q.processAllAvailable()
      val afterFirst = spark.table("latesess")
        .filter(col("user_id") === 7L).collect()
      assert(afterFirst.length == 1)
      assert(afterFirst.head.getAs[Long]("n_events") == 2L)
      // batch 2: a LATE event for user 7 at 10:05 — inside the already
      // emitted session but behind the watermark — plus a fresh user-8
      // event proving the batch itself was processed
      write(dir, Seq((4L, "2024-01-01 10:05:00", 7L, 4.0),
        (5L, "2024-01-01 20:30:00", 8L, 5.0)))
      q.processAllAvailable()
      val user7 = spark.table("latesess")
        .filter(col("user_id") === 7L).collect()
      // still exactly one user-7 session, still 2 events: the late row
      // was dropped at the watermark, it neither merged nor re-opened
      assert(user7.length == 1)
      assert(user7.head.getAs[Long]("n_events") == 2L)
      assert(math.round(user7.head.getAs[Double]("total_value") * 10) == 30L)
      // the fresh row of the same batch WAS processed (emitted once its
      // own session closes — advance the watermark past it to flush)
      write(dir, Seq((6L, "2024-01-02 10:00:00", 99L, 1.0)))
      q.processAllAvailable()
      val user8 = spark.table("latesess")
        .filter(col("user_id") === 8L).collect()
      assert(user8.length == 1 && user8.head.getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("gap sessionization: session boundaries and aggregates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 7L, 1.0), (2L, "2024-01-01 10:10:00", 7L, 2.0),
      (3L, "2024-01-01 11:30:00", 7L, 3.0), // >30 min gap => new session
      (4L, "2024-01-01 10:05:00", 8L, 4.0)
    ).toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val s = EventStream.sessionize(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), r.getDouble(5))).toMap
    assert(s == Map((7L, 1L) -> ((2L, 3.0)), (7L, 2L) -> ((1L, 3.0)),
      (8L, 1L) -> ((1L, 4.0))))
  }

  test("streaming windowed agg equals its batch twin on the events table") {
    val tmp = eventsDir
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
