package graft

/** Drives graft.Main end-to-end like spark-submit would, covering all four
  * subcommands (run / compile / sample / filter). Kept as a runnable (not
  * a suite) because Main owns its own SparkSession lifecycle.
  */
object MainSmoke {
  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("mainsmoke").toString

    // spark.sql.extensions=graft.GraftExtensions exposes the fused
    // pipeline to pure SQL (must be the FIRST session in the JVM — this
    // is exactly how spark-submit would configure it)
    val extSession = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    val extRow = extSession.sql(
      "SELECT fused_measures('The house is on the hill and it is big', true) AS m")
      .selectExpr("m.lang_pred", "m.stats[1] AS word_count", "m.scrubbed_text")
      .head()
    assert(extRow.getString(0) == "en", s"extensions langid: $extRow")
    assert(extRow.getInt(1) == 10, s"extensions word count: $extRow")
    println(s"EXTENSIONS fused_measures OK: $extRow")
    // N syntactic fused_measures(...) calls in one SELECT collapse to ONE
    // evaluation via the injected MaterializeFusedMeasures rule
    extSession.range(3).createOrReplaceTempView("t")
    val multi = extSession.sql(
      "SELECT fused_measures(cast(id AS string), true).lang_pred AS a, " +
        "fused_measures(cast(id AS string), true).ppl AS b, " +
        "fused_measures(cast(id AS string), true).scrubbed_text AS c FROM t")
    val multiPlan = multi.queryExecution.executedPlan.toString
    val nFused = "fused_measures".r.findAllIn(multiPlan).length
    assert(nFused == 1, s"SQL-surface fused calls not shared (x$nFused):\n" +
      multiPlan.take(2000))
    assert(multi.collect().length == 3)
    println(s"EXTENSIONS optimizer rule OK: 3 syntactic calls -> $nFused evaluation")
    extSession.stop()

    val prep = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    graft.sources.Pages.load(prep, "/root/testdata/sf0.001")
      .write.parquet(s"$tmp/pages")
    // a tables dir for the check-runner subcommands
    prep.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.parquet(s"$tmp/tables/orders.parquet")
    prep.stop()
    // .env next to the config feeds {{VAR}} templating (main.py:52-59);
    // connections: + slack_url: exercise the config-plumbing parity
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/.env"),
      "SMOKE_TABLE=orders\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/checks.yaml"),
      s"""connections:
        |  - name: metricstore
        |    type: metricstore
        |    uri: $tmp/checkmetrics
        |slack_url: https://hooks.example.com/T000/B000/SMOKE
        |checks:
        |  - name: orders count
        |    dataset: '{{SMOKE_TABLE}}'
        |    type: row_count
        |    condition: gt
        |    threshold: 100
        |  - name: impossible max
        |    dataset: orders
        |    type: max
        |    measure: o_totalprice
        |    condition: le
        |    threshold: 1
        |""".stripMargin)

    // filter (legacy positional form)
    Main.main(Array(s"$tmp/pages", s"$tmp/out", s"$tmp/metrics", "smoke1", "4"))
    // compile: validates plans, executes nothing
    Main.main(Array("compile", s"$tmp/checks.yaml", s"$tmp/tables"))
    // run: executes checks, prints table + failure report + the slack
    // payload POST (slack_url is set); '@config' resolves the metric
    // store from the connections: list
    Main.main(Array("run", s"$tmp/checks.yaml", s"$tmp/tables",
      "@config", "smokerun"))
    // sample: seeds deterministic history
    Main.main(Array("sample", s"$tmp/checks.yaml", s"$tmp/checkmetrics",
      "orders count"))
    // a typo'd subcommand must error, not fall through to a filter job
    val bad = try { Main.main(Array("runs", "a", "b", "c", "d")); None }
              catch { case e: RuntimeException => Some(e.getMessage) }
    assert(bad.exists(_.contains("unknown subcommand")), s"got: $bad")
    // dedup: dup-graph decisions over a documents parquet
    Main.main(Array("dedup", "/root/testdata/sf0.001/documents.parquet",
      s"$tmp/dedup", "0.5"))

    // incremental dedup from the CLI: the same corpus split into a
    // committed part and a fresh snapshot, fresh deduped --against it
    {
      val fx = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
      val docs = fx.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val isFresh = "doc_id % 4 IN (1, 2)"
      docs.filter(s"NOT ($isFresh)").write.parquet(s"$tmp/inccorpus")
      docs.filter(isFresh).write.parquet(s"$tmp/incfresh")
      fx.stop()
      val incOut = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(incOut, true)) {
        Main.main(Array("dedup", s"$tmp/incfresh", s"$tmp/incdedup", "0.5",
          "doc_id", "text", s"--against=$tmp/inccorpus"))
      }
      assert(incOut.toString.linesIterator.exists(
        _.startsWith("incremental dedup complete: 250 fresh docs")),
        s"unexpected incremental output:\n${incOut.toString.take(500)}")
      // an unknown flag must fail loudly, never parse as a positional arg
      val badFlag = try {
        Main.main(Array("dedup", s"$tmp/incfresh", s"$tmp/incdedup",
          "--agianst=x")); None
      } catch { case e: RuntimeException => Some(e.getMessage) }
      assert(badFlag.exists(_.contains("unknown dedup flag")), s"$badFlag")
    }

    // semdedup: semantic dedup over the fixture embeddings from the CLI;
    // at cosine >= 0.35 in 8 cells the synthetic embeddings form
    // non-trivial components (same shape the dedup_semantic gate pins)
    {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out, true)) {
        Main.main(Array("semdedup",
          "/root/testdata/sf0.001/embeddings.parquet", s"$tmp/semdedup",
          "0.35", "8"))
      }
      val line = out.toString.linesIterator
        .find(_.startsWith("semantic dedup complete")).getOrElse(
          sys.error(s"semdedup printed nothing:\n${out.toString.take(500)}"))
      val dropped = "(\\d+) semantic\\b".r.findFirstMatchIn(line)
        .map(_.group(1).toLong).getOrElse(sys.error(s"bad line: $line"))
      assert(line.contains("500 docs") && dropped > 0 && dropped < 500,
        s"semdedup not discriminating: $line")
      println(s"SEMDEDUP subcommand OK: $line")
    }

    // eval: the acceptance metric (keep/drop F1) from the CLI. Reference
    // labels = the filter's own verdicts with ~1/50 of keeps flipped, so
    // the confusion counts are non-trivial and known independently.
    {
      val fx = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
      import org.apache.spark.sql.functions.{col, abs, hash, pmod, when, lit}
      val pred = fx.read.parquet(s"$tmp/out").select("url", "keep")
      val flip = pmod(abs(hash(col("url"))), lit(50)) === 0
      val ref = pred.withColumn("keep", when(flip, !col("keep"))
        .otherwise(col("keep")))
      ref.write.parquet(s"$tmp/refLabels")
      val n = pred.count()
      val expTp = pred.filter(col("keep") && !flip).count()
      val expFp = pred.filter(col("keep") && flip).count()
      val expFn = pred.filter(!col("keep") && flip).count()
      assert(expFp + expFn > 0, "flip fixture selected no rows")
      fx.stop()
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out, true)) {
        Main.main(Array("eval", s"$tmp/out", s"$tmp/refLabels"))
      }
      val line = out.toString.linesIterator
        .find(_.startsWith("{\"n\":")).getOrElse(
          sys.error(s"eval printed no JSON line:\n${out.toString.take(500)}"))
      val p = expTp.toDouble / (expTp + expFp)
      val r = expTp.toDouble / (expTp + expFn)
      val expF1 = 2 * p * r / (p + r)
      assert(line.contains(s""""n":$n""") && line.contains(s""""tp":$expTp""") &&
        line.contains(s""""fp":$expFp""") && line.contains(s""""fn":$expFn""") &&
        line.contains(s""""f1":$expF1"""), s"eval line mismatch: $line " +
        s"(expected n=$n tp=$expTp fp=$expFp fn=$expFn f1=$expF1)")
      println(s"EVAL subcommand OK: $line")
    }

    // pipeline: filter -> dedup -> corpus end-to-end from the CLI
    val pipeOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(pipeOut, true)) {
      Main.main(Array("pipeline", s"$tmp/pages", s"$tmp/pipe",
        s"$tmp/pipemetrics", "smokepipe", "4", "0.5"))
    }
    val pline = pipeOut.toString.linesIterator
      .find(_.startsWith("{\"pages\":")).getOrElse(
        sys.error(s"pipeline printed no JSON:\n${pipeOut.toString.take(500)}"))
    assert(pline.contains("\"pages\":500") &&
      pline.contains("\"buckets_run\":4") &&
      pline.contains("\"corpus_recomputed\":true"), s"pipeline line: $pline")
    println(s"PIPELINE subcommand OK: $pline")

    // pipeline with url-rule flags: the blocked host (25 pages) never
    // enters the run, so the report's page count drops by exactly 25
    val pipeUrlOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(pipeUrlOut, true)) {
      Main.main(Array("pipeline", s"$tmp/pages", s"$tmp/pipeurl",
        s"$tmp/pipeurlmetrics", "smokepipeu", "4", "0.5",
        "--block-host=src1.example.com"))
    }
    val puline = pipeUrlOut.toString.linesIterator
      .find(_.startsWith("{\"pages\":")).getOrElse(
        sys.error(s"url pipeline printed no JSON:\n${pipeUrlOut.toString.take(500)}"))
    assert(puline.contains("\"pages\":475"), s"url pipeline line: $puline")

    // pipeline with the trained-classifier gate: model drops show up in
    // the report and the counts identity still closes (exact drop count
    // is pinned in PipelineFullSpec; here we pin the CLI plumbing)
    val pipeQOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(pipeQOut, true)) {
      Main.main(Array("pipeline", s"$tmp/pages", s"$tmp/pipeq",
        s"$tmp/pipeqmetrics", "smokepipeq", "4", "0.5",
        "--min-quality=0.5"))
    }
    val pqline = pipeQOut.toString.linesIterator
      .find(_.startsWith("{\"pages\":")).getOrElse(
        sys.error(s"model pipeline printed no JSON:\n${pipeQOut.toString.take(500)}"))
    val pqDropped = "\"model_dropped\":(\\d+)".r
      .findFirstMatchIn(pqline).map(_.group(1).toLong).getOrElse(
        sys.error(s"no model_dropped in: $pqline"))
    assert(pqDropped > 0, s"gate not discriminating at 0.5: $pqline")

    val check = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    val pc = check.read.parquet(s"$tmp/pipe/corpus")
    assert(pc.count() > 0 && pc.count() < 500)
    assert(pc.filter("NOT keep").count() == 0)
    val dd = check.read.parquet(s"$tmp/dedup")
    assert(dd.count() == 500)
    assert(dd.filter("NOT keep").count() > 0, "expected seeded dup clusters")
    val inc = check.read.parquet(s"$tmp/incdedup")
    assert(inc.count() == 250)
    assert(inc.filter("NOT keep AND dup_of IS NULL").count() == 0)
    assert(inc.filter("keep AND dup_of IS NOT NULL").count() == 0)
    assert(inc.filter("NOT keep AND dup_of % 4 NOT IN (1, 2)").count() > 0,
      "expected fresh docs resolved to corpus docs")
    val n = check.read.parquet(s"$tmp/out").count()
    val m = check.read.parquet(s"$tmp/metrics").count()
    val cm = new graft.sources.MetricsStore(s"$tmp/checkmetrics").read(check)
    val runRows = cm.filter(org.apache.spark.sql.functions
      .col("run_id") === "smokerun").count()
    val sampleRows = cm.filter(org.apache.spark.sql.functions
      .col("run_id") === "sample").count()
    println(s"MAINSMOKE verdicts=$n metrics=$m run=$runRows sample=$sampleRows")
    assert(n == 500 && m > 0)
    assert(runRows == 2, s"expected 2 check rows, got $runRows")
    assert(sampleRows == 31, s"expected 31 sample rows, got $sampleRows")
    // run wrote the machine-readable per-run report next to the store
    val reportJson = java.nio.file.Files.readString(java.nio.file.Paths
      .get(s"$tmp/checkmetrics/_report_smokerun.json"))
    assert(reportJson.contains("\"run_id\":\"smokerun\"") &&
      reportJson.contains("\"failed\":1"), s"report: $reportJson")
    check.stop()
  }
}
