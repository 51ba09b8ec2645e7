package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans._
import graft.sources.{MetricsStore, SampleGenerator}

/** spark-submit entry point with the reference's CLI surface
  * (weiser/main.py:32,83,112 — run / compile / sample) plus the flagship
  * quality-filter job:
  *
  *   graft.Main run     <configYaml> <tablesDir> <metricsDir> <runId>
  *   graft.Main compile <configYaml> <tablesDir>
  *   graft.Main sample  <configYaml> <metricsDir> <checkName> [runId]
  *   graft.Main filter  <pagesDir> <outDir> <metricsDir> <runId>
  *                      [buckets] [configYaml]
  *   graft.Main dedup   <docsParquet> <outDir> [jaccard] [keyCol] [textCol]
  *                      [maxIter] [hashmin|star] [strict|besteffort]
  *   graft.Main pipeline <pagesDir> <outDir> <metricsDir> <runId>
  *                      [buckets] [jaccard] [configYaml]
  *                      [--block-host=a,b] [--ban-url=x,y]
  *                      [--max-docs-per-host=N]
  *   graft.Main semdedup <embParquet> <outDir> [cosine] [k] [keyCol]
  *                      [vecCol]
  *   graft.Main eval    <predParquet> <refParquet> [keyCol] [labelCol]
  *
  * `run` executes every check in the config against the parquet tables in
  * <tablesDir> (table name = file basename), appends metric rows, prints
  * the per-check results table and the failure report (reference
  * export.py:94-128 / 15-91). `compile` validates and prints every check's
  * analyzed plan without executing. `sample` seeds deterministic metric
  * history for a named check (reference runner:52-116). `filter` runs the
  * web-scale quality-filter pipeline bucket-by-bucket with
  * checkpoint-resume (operators/Resume); rules come from the YAML config's
  * checks: block when given, else QualityFilter.defaultRules.
  *
  * For backward compatibility, a first argument that is not a subcommand
  * is treated as `filter`'s <pagesDir>.
  */
object Main {

  private def session(name: String): SparkSession = {
    val builder = SparkSession.builder()
      .appName(name)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; bare JVM launches fall back to
    // local mode for testing
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def loadTables(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
    files.map { f =>
      val name = f.getName.stripSuffix(".parquet")
      val df = spark.read.parquet(f.getPath)
      df.createOrReplaceTempView(name)
      name -> df
    }.toMap
  }

  /** Config load with `.env` parity (reference main.py:52-59): a dotenv
    * next to the config or in the CWD feeds {{VAR}} templating, with real
    * process env vars winning.
    */
  private def loadConfig(cfgPath: String): BaseConfig =
    ConfigLoader.load(cfgPath, ConfigLoader.envForConfig(cfgPath))

  /** Metric-store path: an explicit CLI dir, or `@config` to resolve the
    * first metricstore connection from the YAML `connections:` list
    * (reference runner:124-128 picks the store connection from config).
    */
  private def storeFor(metricsDir: String, cfg: BaseConfig): MetricsStore =
    if (metricsDir != "@config") new MetricsStore(metricsDir)
    else {
      val c = cfg.connections.find(_.connType == "metricstore").getOrElse(
        throw new IllegalArgumentException(
          "metricsDir '@config' requires a metricstore entry under connections:"))
      require(c.uri.nonEmpty, s"connection '${c.name}' has no uri")
      new MetricsStore(c.uri)
    }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("run") =>
      require(args.length >= 5,
        "usage: graft.Main run <configYaml> <tablesDir> <metricsDir|@config> <runId>")
      val Array(_, cfgPath, tablesDir, metricsDir, runId) = args.take(5)
      val spark = session(s"graft-run-$runId")
      val cfg = loadConfig(cfgPath)
      val store = storeFor(metricsDir, cfg)
      val runTime = new java.sql.Timestamp(System.currentTimeMillis())
      val res = Runner.run(cfg, spark, loadTables(spark, tablesDir), store,
        runId, runTime)
      println(Export.renderTable(
        store.read(spark).filter(col("run_id") === runId), showIds = false))
      // webhook only when slack_url is configured (reference export.py:38);
      // the sandbox has no egress, so the sender renders the POST it would
      // make — a real deployment swaps in an HTTP client here
      val report = Export.exportResults(spark, store, runId, runTime,
        sender = cfg.slackUrl.map(Export.printingSender))
      // machine-readable per-run report next to the metric store: the
      // composable CLI analog of the reference's dashboard export
      val reportPath = Export.writeReportJson(store.path, report)
      println(s"run $runId complete: total=${res.total} " +
        s"success=${res.successes} fail=${res.failures} " +
        s"(reported ${report.failures.size} failure details; " +
        s"report at $reportPath)")
      spark.stop()

    case Some("compile") =>
      require(args.length >= 3,
        "usage: graft.Main compile <configYaml> <tablesDir>")
      val spark = session("graft-compile")
      val cfg = loadConfig(args(1))
      val plans = Runner.compile(cfg, spark, loadTables(spark, args(2)))
      plans.foreach(println)
      println(s"compiled ${plans.size} checks OK")
      spark.stop()

    case Some("sample") =>
      require(args.length >= 4,
        "usage: graft.Main sample <configYaml> <metricsDir> <checkName> [runId]")
      val spark = session("graft-sample")
      val cfg = loadConfig(args(1))
      val store = storeFor(args(2), cfg)
      val runId = if (args.length > 4) args(4) else "sample"
      val check = cfg.checks.find(_.name == args(3)).getOrElse(
        throw new IllegalArgumentException(s"no check named '${args(3)}'"))
      val threshold = check.threshold match {
        case Left(t)         => t
        case Right((lo, hi)) => (lo + hi) / 2
      }
      val checkId = check.checkId.getOrElse(check.name)
      val hist = SampleGenerator.history(spark, checkId, threshold)
        .withColumn("name", lit(check.name))
        .withColumn("success", lit(true))
        .withColumn("fail", lit(false))
        .withColumn("run_id", lit(runId))
        .withColumn("id", sha2(concat(col("check_id"),
          col("run_time").cast("string")), 256))
      val n = store.appendResumable(spark, hist)
      println(s"sample: seeded $n history rows for check '${check.name}' " +
        s"(check_id $checkId)")
      spark.stop()

    case Some("dedup") =>
      // dup-graph dedup over a documents parquet: minhash+LSH candidate
      // pairs, exact-jaccard verification, connected components ->
      // (key, cluster_id, keep) decisions written to <outDir>.
      // --against=<corpusParquet> switches to INCREMENTAL mode: the docs
      // parquet is a fresh snapshot deduped against that committed corpus
      // (corpus priority; output rows are (key, keep, dup_of) for the
      // fresh docs only)
      val against = args.collectFirst {
        case s if s.startsWith("--against=") =>
          s.stripPrefix("--against=")
      }
      // --bloom-fpp=<d>: incremental-mode Bloom prefilter false-positive
      // rate (<= 0 disables; results are identical either way — the
      // filter only trims the corpus side before its exchanges)
      val bloomFpp = args.collectFirst {
        case s if s.startsWith("--bloom-fpp=") =>
          s.stripPrefix("--bloom-fpp=").toDouble
      }.getOrElse(0.03)
      // --write-corpus-meta=<dir>: treat <docsParquet> as a committed
      // corpus and write its incremental-dedup metadata (exact-collapse
      // representative fingerprints + LSH band keys) to <dir>, then exit —
      // the corpus-commit-time step the incremental scaladoc promises.
      // --corpus-meta=<dir>: incremental mode reads that metadata instead
      // of re-collapsing and re-banding the corpus per snapshot (corpus
      // text is then only scanned to shingle verified candidates).
      val writeMeta = args.collectFirst {
        case s if s.startsWith("--write-corpus-meta=") =>
          s.stripPrefix("--write-corpus-meta=")
      }
      val readMeta = args.collectFirst {
        case s if s.startsWith("--corpus-meta=") =>
          s.stripPrefix("--corpus-meta=")
      }
      args.filter(s => s.startsWith("--") && !s.startsWith("--against=") &&
          !s.startsWith("--bloom-fpp=") &&
          !s.startsWith("--write-corpus-meta=") &&
          !s.startsWith("--corpus-meta="))
        .foreach(f => sys.error(s"unknown dedup flag '$f'"))
      require(readMeta.isEmpty || against.nonEmpty,
        "--corpus-meta requires --against (incremental mode)")
      require(writeMeta.isEmpty || against.isEmpty,
        "--write-corpus-meta is a corpus-commit-time step; drop --against")
      val a = args.filterNot(_.startsWith("--"))
      // --write-corpus-meta is a corpus-commit-time step with its own
      // positional shape (no <outDir>, no jaccard — neither is used):
      //   dedup <docsParquet> [keyCol] [textCol] --write-corpus-meta=<dir>
      // Sharing the normal shape's positions silently put keyCol into
      // the unused outDir slot (metadata committed under the wrong key)
      // or crashed parsing textCol as the jaccard double.
      require(a.length >= (if (writeMeta.nonEmpty) 2 else 3),
        "usage: graft.Main dedup <docsParquet> <outDir> [jaccard] [keyCol] " +
          "[textCol] [maxIter] [hashmin|star] [strict|besteffort] " +
          "[--against=<corpusParquet>] [--bloom-fpp=<d>] " +
          "[--corpus-meta=<dir>]\n" +
          "   or: graft.Main dedup <docsParquet> [keyCol] [textCol] " +
          "--write-corpus-meta=<dir>")
      require(writeMeta.isEmpty || a.length <= 4,
        s"--write-corpus-meta takes at most <docsParquet> [keyCol] " +
          s"[textCol]; got ${a.length - 1} positionals")
      val args2 = a // positional view below
      val threshold =
        if (writeMeta.nonEmpty) 0.8
        else if (args2.length > 3) args2(3).toDouble else 0.8
      val keyCol =
        if (writeMeta.nonEmpty)
          (if (args2.length > 2) args2(2) else "doc_id")
        else if (args2.length > 4) args2(4) else "doc_id"
      val textCol =
        if (writeMeta.nonEmpty)
          (if (args2.length > 3) args2(3) else "text")
        else if (args2.length > 5) args2(5) else "text"
      // component-propagation round cap: the dup-graph construction bounds
      // cluster diameter, but a corpus with long chains of near-dup pairs
      // (serially-edited pages) can exceed it — this is the operator knob;
      // `star` switches to large-star/small-star contraction (O(log^2 n)
      // rounds regardless of diameter) for exactly those corpora
      val maxIter = if (args2.length > 6) args2(6).toInt else 20
      val algo = if (args2.length > 7) args2(7) else "hashmin"
      // strict (default): hashmin throws if maxIter rounds don't converge;
      // besteffort: accept the labels of the last round (clusters may be
      // split, never merged wrongly) — the spark-submit escape hatch when a
      // pathological chain corpus must still produce output tonight
      val strict = if (args2.length > 8) args2(8) match {
        case "strict" => true
        case "besteffort" => false
        case other => sys.error(
          s"unknown convergence mode '$other' (expected strict|besteffort)")
      } else true
      val spark = session("graft-dedup")
      val docs = spark.read.parquet(args2(1))
      // the metadata is only valid under the banding parameters it was
      // computed with — commit them next to it and refuse a drifted read
      // (same philosophy as dedupResumable's _PARAMS guard). The banding
      // parameters are named HERE and passed explicitly to BOTH the
      // write call and the incremental run below, so the guard validates
      // the values the jobs actually use (a hardcoded string would keep
      // matching itself if the library defaults ever moved).
      val metaNumHashes = 64
      val metaBands = 16
      val metaShingleN = 3
      def metaParamsLine(kc: String, tc: String): String =
        s"keyCol=$kc;textCol=$tc;numHashes=$metaNumHashes;" +
          s"bands=$metaBands;shingleN=$metaShingleN"
      if (writeMeta.nonEmpty) {
        val dir = writeMeta.get
        val (fps, bnds) = graft.operators.Dedup.corpusDedupMeta(
          docs, keyCol, textCol, numHashes = metaNumHashes,
          bands = metaBands, shingleN = metaShingleN)
        fps.write.mode("overwrite").parquet(s"$dir/fingerprints")
        bnds.write.mode("overwrite").parquet(s"$dir/bands")
        graft.sources.Fs.writeString(s"$dir/_PARAMS",
          metaParamsLine(keyCol, textCol), overwrite = true)
        graft.operators.Dedup.releaseCaches()
        println(s"corpus dedup metadata written to $dir " +
          "(fingerprints/ + bands/ + _PARAMS)")
      } else against match {
        case Some(corpusPath) =>
          // incremental: one-shot job (the corpus side is metadata-cheap:
          // fingerprints + band keys; pass --corpus-meta=<dir> to read
          // the committed metadata instead of re-deriving it per snapshot)
          val corpus = spark.read.parquet(corpusPath)
          val meta = readMeta.map { dir =>
            val pf = s"$dir/_PARAMS"
            // a missing _PARAMS is a loud error, not a skipped check:
            // metadata committed through the library API (no _PARAMS)
            // could have been built under ANY banding parameters, and
            // drifted band keys match nothing — silently dropping every
            // near-dup cross link, the exact failure the guard exists
            // to catch
            require(graft.sources.Fs.exists(pf),
              s"--corpus-meta=$dir has no _PARAMS record, so its banding " +
                "parameters cannot be checked against this run's. " +
                "Rewrite the metadata with --write-corpus-meta (which " +
                "commits _PARAMS), or call Dedup.dedupIncremental " +
                "directly if you can vouch for the parameters yourself.")
            val committed = graft.sources.Fs.readString(pf)
            val requested = metaParamsLine(keyCol, textCol)
            require(committed == requested,
              s"--corpus-meta=$dir was committed under different " +
                s"parameters.\n  committed: $committed\n  requested: " +
                s"$requested\nBand keys from drifted parameters match " +
                "nothing and would silently drop every near-dup cross " +
                "link — rewrite the metadata with --write-corpus-meta.")
            (spark.read.parquet(s"$dir/fingerprints"),
              spark.read.parquet(s"$dir/bands"))
          }
          graft.operators.Dedup.dedupIncremental(corpus, docs,
            keyCol, textCol, numHashes = metaNumHashes,
            bands = metaBands, jaccardThreshold = threshold,
            shingleN = metaShingleN,
            maxIter = maxIter, strict = strict, algorithm = algo,
            bloomFpp = bloomFpp, corpusMeta = meta)
            .write.mode("overwrite").parquet(args2(2))
          val out = spark.read.parquet(args2(2))
          val total = out.count()
          // corpus-resolved = dropped rows whose dup_of is not a fresh key
          // (anti-join, never a collected key list)
          val toCorpus = out.filter(!col("keep"))
            .join(out.select(col(keyCol).as("dup_of")), Seq("dup_of"),
              "left_anti").count()
          val dropped = out.filter(!col("keep")).count()
          println(s"incremental dedup complete: $total fresh docs, " +
            s"$dropped dropped ($toCorpus resolved to corpus docs, " +
            s"${dropped - toCorpus} within the snapshot, " +
            s"${total - dropped} kept) at jaccard >= $threshold")
        case None =>
          // checkpoint-resumable DAG: each stage (reps/links/cand/pairs/
          // decisions) commits as one atomic parquet job in
          // <outDir>_stages; a killed run restarts from the first
          // uncommitted stage instead of recomputing the whole pipeline
          // (the quality filter's bucket-resume protocol applied to the
          // dedup job)
          val (decisions, report) = graft.operators.Dedup.dedupResumable(
            docs, keyCol, textCol, stageDir = s"${args2(2)}_stages",
            jaccardThreshold = threshold, maxIter = maxIter,
            strict = strict, algorithm = algo)
          decisions.write.mode("overwrite").parquet(args2(2))
          val out = spark.read.parquet(args2(2))
          val total = out.count()
          val dropped = out.filter(!col("keep")).count()
          println(s"dedup complete: $total docs, $dropped duplicates " +
            s"dropped (${total - dropped} kept) at jaccard >= $threshold; " +
            s"stages run=[${report.ran.mkString(",")}] " +
            s"resumed=[${report.skipped.mkString(",")}]")
      }
      spark.stop()

    case Some("pipeline") =>
      // the full corpus job: bucketed quality filter -> stage-resumable
      // near-dup dedup of the keepers -> final corpus (quality-keep AND
      // dedup-keep). Restart-safe at every unit: committed buckets,
      // committed dedup stages and a committed corpus are never redone.
      // url-rule flags (stage 0, applied before any text is parsed) are
      // order-independent: --block-host=a,b --ban-url=x,y
      // --max-docs-per-host=N; everything else stays positional
      val (flags, pos) = args.partition(_.startsWith("--"))
      // loud unknown-flag guard (mirrors the dedup subcommand): a typo
      // like --block-hosts= or --min-qual= must fail by name, not
      // silently disable url curation or the classifier gate
      val knownPipelineFlags = Seq("--block-host=",
        "--ban-url=", "--max-docs-per-host=", "--min-quality=")
      flags.filterNot(f => knownPipelineFlags.exists(f.startsWith))
        .foreach(f => sys.error(s"unknown pipeline flag '$f'"))
      def flagList(name: String): Seq[String] = flags.toSeq
        .filter(_.startsWith(s"--$name="))
        .flatMap(_.drop(name.length + 3).split(",")).filter(_.nonEmpty)
      val maxPerHost = flags.find(_.startsWith("--max-docs-per-host="))
        .map(_.drop("--max-docs-per-host=".length).toLong)
        .getOrElse(Long.MaxValue)
      // opt-in trained-classifier gate (QualityModel over scrubbed text,
      // applied between the heuristic filter and dedup)
      val minQuality = flags.find(_.startsWith("--min-quality="))
        .map(_.drop("--min-quality=".length).toDouble)
      require(pos.length >= 5,
        "usage: graft.Main pipeline <pagesDir> <outDir> <metricsDir> " +
          "<runId> [buckets] [jaccard] [configYaml] [--block-host=a,b] " +
          "[--ban-url=x,y] [--max-docs-per-host=N] [--min-quality=P]")
      val Array(_, pagesDir, outDir, metricsDir, runId) = pos.take(5)
      val buckets = if (pos.length > 5) pos(5).toInt else 64
      val jaccard = if (pos.length > 6) pos(6).toDouble else 0.8
      val rules =
        if (pos.length > 7) {
          val cfg = loadConfig(pos(7))
          val fromCfg = cfg.checks.map(graft.operators.RowRule.fromCheck)
          require(fromCfg.nonEmpty, "config has no checks")
          fromCfg
        } else graft.operators.QualityFilter.defaultRules
      val spark = session(s"graft-pipeline-$runId")
      val report = graft.operators.Pipeline.runFull(spark,
        spark.read.parquet(pagesDir), outDir, metricsDir, runId,
        buckets = buckets, jaccardThreshold = jaccard, rules = rules,
        blockedHosts = flagList("block-host"),
        bannedUrlParts = flagList("ban-url"), maxDocsPerHost = maxPerHost,
        minQualityProb = minQuality)
      println(report.json)
      spark.stop()

    case Some("semdedup") =>
      // SemDeDup-style semantic dedup over an embeddings parquet:
      // deterministic IVF cells, within-cell cosine edges, min-key
      // representative per component -> (key, cluster_id, keep)
      require(args.length >= 3,
        "usage: graft.Main semdedup <embParquet> <outDir> [cosine] [k] " +
          "[keyCol] [vecCol]")
      val threshold = if (args.length > 3) args(3).toDouble else 0.95
      val k = if (args.length > 4) args(4).toInt else 16
      val keyCol = if (args.length > 5) args(5) else "vec_id"
      val vecCol = if (args.length > 6) args(6) else "embedding"
      val spark = session("graft-semdedup")
      graft.operators.Similarity.semanticDedup(
        spark.read.parquet(args(1)), keyCol, vecCol,
        k = k, cosineThreshold = threshold)
        .write.mode("overwrite").parquet(args(2))
      val out = spark.read.parquet(args(2))
      val total = out.count()
      val dropped = out.filter(!col("keep")).count()
      println(s"semantic dedup complete: $total docs, $dropped semantic " +
        s"duplicates dropped (${total - dropped} kept) at cosine >= " +
        s"$threshold in $k cells")
      spark.stop()

    case Some("eval") =>
      // acceptance-metric measurement from spark-submit: keep/drop F1 of a
      // predicted-verdicts parquet against a reference-labels parquet,
      // joined on keyCol (north rule: F1 >= 0.99 vs reference labels).
      // Prints ONE machine-readable JSON line.
      require(args.length >= 3,
        "usage: graft.Main eval <predParquet> <refParquet> [keyCol] [labelCol]")
      val keyCol = if (args.length > 3) args(3) else "url"
      val labelCol = if (args.length > 4) args(4) else "keep"
      val spark = session("graft-eval")
      val r = graft.operators.Eval.keepF1(
        spark.read.parquet(args(1)), spark.read.parquet(args(2)),
        keyCol, labelCol)
      println(s"""{"n":${r.n},"tp":${r.truePos},"fp":${r.falsePos},""" +
        s""""fn":${r.falseNeg},"precision":${r.precision},""" +
        s""""recall":${r.recall},"f1":${r.f1}}""")
      spark.stop()

    case Some(first) =>
      // `filter` subcommand, or legacy positional form (first arg =
      // pagesDir). The legacy form is only accepted when the first arg is
      // an existing directory — a typo'd subcommand ('runs', 'samlpe')
      // must error as such, not start a filter job against wrong paths.
      if (first != "filter" && !new java.io.File(first).isDirectory)
        sys.error(s"unknown subcommand '$first' " +
          "(expected run|compile|sample|filter|pipeline|dedup|semdedup|eval, or an existing " +
          "pagesDir for the legacy positional filter form)")
      val a = if (first == "filter") args.drop(1) else args
      require(a.length >= 4,
        "usage: graft.Main filter <pagesDir> <outDir> <metricsDir> <runId> " +
          "[buckets] [configYaml]")
      val Array(pagesDir, outDir, metricsDir, runId) = a.take(4)
      val buckets = if (a.length > 4) a(4).toInt else 64
      val spark = session(s"graft-quality-filter-$runId")
      val rules =
        if (a.length > 5) {
          val cfg = loadConfig(a(5))
          val fromCfg = cfg.checks.map(graft.operators.RowRule.fromCheck)
          require(fromCfg.nonEmpty, "config has no checks")
          fromCfg
        } else graft.operators.QualityFilter.defaultRules
      graft.operators.Resume.runBucketed(spark,
        spark.read.parquet(pagesDir), outDir, metricsDir, runId, buckets,
        rules = rules)
      val summary = new MetricsStore(metricsDir)
        .summary(spark, runId).head()
      println(s"run $runId complete: total=${summary.getAs[Long]("total")} " +
        s"success=${summary.getAs[Long]("success_count")} " +
        s"fail=${summary.getAs[Long]("fail_count")}")
      spark.stop()

    case None =>
      sys.error("usage: graft.Main run|compile|sample|filter|pipeline|dedup|semdedup|eval ...")
  }
}
