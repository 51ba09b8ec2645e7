package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans._

/** Plan-shape assertions (SURVEY.md §5.2 item 2): the declarative check
  * compiler must hand Catalyst plans it can optimize — filters pushed into
  * the parquet scan, scans pruned to referenced columns, small dimension
  * joins broadcast, single-shuffle aggregates.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private val runTime = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("check filter is pushed down to the parquet scan") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val c = Check("rc", Seq("lineitem"), CheckType.RowCount,
      condition = Condition.Gt, threshold = Left(0),
      filter = Some("l_returnflag = 'R'"))
    val plan = planOf(CheckCompiler.run(c, spark, Map("lineitem" -> li),
      "ds", "r", runTime))
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      s"filter not pushed:\n${plan.take(2000)}")
  }

  test("check scan is pruned to the referenced columns only") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val c = Check("s", Seq("lineitem"), CheckType.Sum,
      measure = Some("l_quantity"), condition = Condition.Gt,
      threshold = Left(0), dimensions = Seq("l_returnflag"))
    val plan = planOf(CheckCompiler.run(c, spark, Map("lineitem" -> li),
      "ds", "r", runTime))
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_extendedprice"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("small dimension joins are broadcast, not shuffled") {
    val plan = planOf(SparkEntry.queries("q_join_broadcast_dims")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), "dim join fell back to SMJ")
  }

  test("grouped check is a single-shuffle partial aggregate") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val c = Check("s", Seq("lineitem"), CheckType.Sum,
      measure = Some("l_quantity"), condition = Condition.Gt,
      threshold = Left(0), dimensions = Seq("l_returnflag"))
    val plan = planOf(CheckCompiler.run(c, spark, Map("lineitem" -> li),
      "ds", "r", runTime))
    // exactly one exchange: partial agg -> shuffle -> final agg
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"expected 1 shuffle:\n${plan.take(2000)}")
  }

  test("session_window plans as partial-agg -> ONE exchange -> merging sessions") {
    val plan = planOf(SparkEntry.queries("q_session_window")(spark, dir))
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"expected 1 shuffle:\n${plan.take(2000)}")
    assert(plan.contains("MergingSessions"), plan.take(1500))
    // map-side combine happens before the shuffle
    assert(plan.contains("partial_min"), plan.take(1500))
  }

  test("not_empty over N dimensions compiles to ONE scan (vs reference's " +
    "one query per dimension)") {
    val li = spark.read.parquet(s"$dir/orders.parquet")
    val c = Check("ne", Seq("orders"), CheckType.NotEmpty,
      condition = Condition.Le, threshold = Left(0),
      dimensions = Seq("o_orderstatus", "o_orderpriority", "o_custkey"))
    val plan = planOf(CheckCompiler.run(c, spark, Map("orders" -> li),
      "ds", "r", runTime))
    assert("FileScan".r.findAllIn(plan).length == 1,
      s"expected a single scan:\n${plan.take(2000)}")
  }

  test("quality filter is shuffle-free from scan to verdict") {
    val pages = graft.sources.Pages.load(spark, dir)
    val plan = planOf(graft.operators.QualityFilter.run(pages))
    assert(!plan.contains("Exchange"),
      s"pipeline introduced a shuffle:\n${plan.take(2000)}")
  }

  test("urlFilter: no window/sort host cap; host-count join broadcasts " +
    "at fixture scale") {
    val df = SparkEntry.queries("url_filter")(spark, dir)
    df.collect() // finalize the adaptive plan
    val plan = planOf(df)
    // the cap is hash-threshold, not top-K: no Window, no global Sort
    assert(!plan.contains("Window"), s"cap uses a window:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"host-count join not broadcast:\n${plan.take(2000)}")
  }

  test("incremental dedup: band-bucket exchanges ship keys only — no raw " +
    "text in any cross-candidate shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // at fixture scale every join broadcasts (no exchange to inspect);
    // disable broadcast so the plan shows the shuffles a 100 TB run pays
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      val corpus = (0L until 20L).map(i => (i, s"corpus doc number $i with " +
        "some shared words about crawling and indexing the public web"))
        .toDF("doc_id", "text")
      val fresh = (100L until 120L).map(i => (i, s"fresh doc number $i " +
        "with some shared words about crawling and indexing the public web"))
        .toDF("doc_id", "text")
      val out = graft.operators.Dedup.dedupIncremental(corpus, fresh,
        "doc_id", "text", jaccardThreshold = 0.5)
      val shuffles = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      val bandShuffles = shuffles.filter(
        _.outputPartitioning.toString.contains("band"))
      assert(bandShuffles.nonEmpty, "expected band-bucket exchanges")
      // candidate generation shuffles (band, bucket, key) rows only: the
      // text column reaches a shuffle exactly once per side, inside the
      // exact-collapse aggregate — never in the LSH candidate path
      bandShuffles.foreach { e =>
        assert(!e.output.map(_.name).contains("text"),
          s"band shuffle carries raw text: ${e.output.map(_.name)}")
      }
      // the Bloom prefilter over the fresh side's keys must sit BELOW an
      // exchange on the corpus side: corpus rows that cannot match any
      // fresh fingerprint / band bucket are dropped before they shuffle
      val bloomBelowExchange = shuffles.exists(_.collectFirst {
        case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.toString.contains("bloom_might_contain") => f
      }.nonEmpty)
      assert(bloomBelowExchange,
        "expected a bloom_might_contain filter below a shuffle exchange")
      graft.operators.Dedup.releaseCaches()
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("bloom prefilter measurably shrinks the corpus-side band shuffle " +
    "(SQL metrics, bloom on vs off)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      // disjoint vocabularies: fresh band buckets miss (almost) every
      // corpus band bucket, so the bloom filter should drop (almost) the
      // whole corpus side before its exchange
      val corpus = (0L until 100L).map(i => (i, s"corpus page $i entirely " +
        s"about warehouse shelving logistics pallet $i forklift routing " +
        s"manifest ${i * 7} dock scheduling yard management")).toDF("doc_id", "text")
      val fresh = (1000L until 1010L).map(i => (i, s"fresh page $i on " +
        s"tidepool ecology barnacle $i anemone zonation substrate " +
        s"${i * 3} wave exposure gradients")).toDF("doc_id", "text")
      def bandShuffleBytes(bloomFpp: Double): Long = {
        val out = graft.operators.Dedup.dedupIncremental(corpus, fresh,
          "doc_id", "text", jaccardThreshold = 0.5, bloomFpp = bloomFpp)
        out.collect()
        val bytes = out.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec
              if e.outputPartitioning.toString.contains("band") =>
            e.metrics.get("dataSize").map(_.value).getOrElse(0L)
        }.sum
        graft.operators.Dedup.releaseCaches()
        bytes
      }
      val withBloom = bandShuffleBytes(0.03)
      val noBloom = bandShuffleBytes(-1.0)
      assert(withBloom > 0 && noBloom > 0, s"$withBloom / $noBloom")
      // the fresh side's band rows are identical in both runs, so any
      // drop is corpus rows cut below the exchange; demand a real one
      assert(withBloom * 2 < noBloom,
        s"bloom did not shrink the band shuffle: $withBloom vs $noBloom")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("bucketed tables: same-key same-count bucketing makes the join " +
    "shuffle-free") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      graft.sources.Bucketed.save(
        docs.select("doc_id", "text"), "plan_bkt_docs", "doc_id", 8)
      graft.sources.Bucketed.save(
        docs.select(col("doc_id"), length(coalesce(col("text"), lit("")))
          .as("doc_len")), "plan_bkt_len", "doc_id", 8)
      val j = graft.sources.Bucketed.colocatedJoin(spark,
        "plan_bkt_docs", "plan_bkt_len", "doc_id")
      assert(j.count() == docs.count())
      val shuffles = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, "bucketed join still shuffles:\n" +
        j.queryExecution.executedPlan.toString.take(2000))
      // control: the same join over plain parquet DOES shuffle — the
      // bucketed layout, not fixture size, is what removed the exchange
      val plainA = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val plainB = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), length(coalesce(col("text"), lit("")))
          .as("doc_len"))
      val pj = plainA.join(plainB, Seq("doc_id"))
      pj.count()
      val plainShuffles = pj.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(plainShuffles.nonEmpty, "control join did not shuffle")
    } finally {
      spark.sql("DROP TABLE IF EXISTS plan_bkt_docs")
      spark.sql("DROP TABLE IF EXISTS plan_bkt_len")
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("dedupLines: heavy-line set probes as a broadcast ANTI join") {
    val df = SparkEntry.queries("lines_dedup")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"heavy-line probe not a broadcast anti join:\n${plan.take(2000)}")
    assert(!plan.contains("Window"), "reassembly uses a window")
  }

  test("fused measure expression: evaluated ONCE, inside codegen, scan " +
    "pruned to referenced columns") {
    val pages = graft.sources.Pages.load(spark, dir)
    val q = graft.operators.QualityFilter.run(pages)
      .select("url", "keep", "scrubbed_text", "lang_pred", "ppl")
    val plan = q.queryExecution.executedPlan.toString
    // one evaluation per row — NOT re-inlined per extracted struct field
    assert("fused_measures".r.findAllIn(plan).length == 1,
      s"fused expression duplicated:\n${plan.take(2000)}")
    // the project computing it is inside a WholeStageCodegen stage
    assert("\\*\\(\\d+\\) Project \\[[^\\n]*fused_measures".r
      .findFirstIn(plan).isDefined,
      s"fused expression fell out of codegen:\n${plan.take(2000)}")
    // column pruning reaches the scan THROUGH the expression (the old
    // mapPartitions island blocked pruning): only the columns the query
    // uses are read
    val rs = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(rs.contains("text") && !rs.contains("lang:") && !rs.contains("n_chars"),
      s"scan reads unreferenced columns: $rs")
  }

  test("TextScalarExpr counters (stop_hits + script-adaptive twins) stay " +
    "inside whole-stage codegen with the scan pruned") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // NOTE scalar-exprs only: any words()-based Column twin contains a
    // higher-order lambda (ArrayFilter), which is CodegenFallback and
    // excludes the whole ProjectExec from whole-stage codegen — that is
    // a long-standing property of the lambda twins (the production path
    // is the fused expression), and exactly why these counters are
    // native expressions with doGenCode rather than lambdas
    val q = docs.select(col("doc_id"),
      graft.functions.TextScalarExpr(col("text"), "stop_hits").as("sh"),
      graft.functions.Heuristics.scriptNoSpaceFraction(col("text"))
        .as("nsf"),
      graft.functions.TextScalarExpr(col("text"), "nospace_stop_cover")
        .as("cov"),
      graft.functions.TextScalarExpr(col("text"), "char4_dup_fraction")
        .as("c4"))
    val plan = q.queryExecution.executedPlan.toString
    // the project holding the static-call counters is codegen'd — a
    // fallback to interpreted eval would show a bare (non-starred)
    // Project
    assert("\\*\\(\\d+\\) Project \\[[^\\n]*stop_hits".r
      .findFirstIn(plan).isDefined,
      s"text scalar fell out of codegen:\n${plan.take(2000)}")
    // only the referenced columns are read
    val rs = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(rs.contains("text") && !rs.contains("lang") && !rs.contains("n_chars"),
      s"scan reads unreferenced columns: $rs")
    // and the FULL driver text_quality query — 11 measure columns — is
    // one codegen'd project end-to-end: after word_count and
    // word_repetition went native, no CodegenFallback lambda remains in
    // its projection (this was a bare Project before round 6)
    val tq = SparkEntry.queries("text_quality")(spark, dir)
    tq.collect() // finalize the AdaptiveSparkPlan so codegen stages show
    // AQE prints Final AND Initial plans; judge only the final one
    val tqPlan = tq.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(tqPlan).isDefined &&
      !"(?m)^\\s*\\+?-? ?Project ".r.findFirstIn(tqPlan).isDefined,
      s"text_quality projection fell out of codegen:\n${tqPlan.take(2000)}")
  }

  test("text_quality_model: scan pruned to (doc_id, text), narrow plan — " +
    "no shuffle around the scoring island") {
    val q = SparkEntry.queries("text_quality_model")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    val rs = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(rs.contains("doc_id") && rs.contains("text") &&
      !rs.contains("lang") && !rs.contains("n_chars"),
      s"scan reads unreferenced columns: $rs")
    // the only exchange is tp()'s deliberate round-robin input spread
    // (single-split test parquet); the scoring itself must add NO
    // key-shuffle
    val exchanges = "Exchange [A-Za-z]+".r.findAllIn(plan).toList
    assert(exchanges.forall(_.contains("RoundRobin")) &&
      exchanges.size <= 1,
      s"unexpected shuffle in a per-row scoring query: $exchanges\n" +
        plan.take(1500))
  }

  test("filter AFTER the pipeline on a passthrough column reaches the " +
    "scan's PushedFilters (the deterministic-flag removal payoff)") {
    val pages = graft.sources.Pages.load(spark, dir)
    val q = graft.operators.QualityFilter.run(pages)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"post-pipeline filter did not reach the scan:\n${plan.take(2000)}")
    // and the pushdown did not duplicate the fused expression
    assert("fused_measures".r.findAllIn(plan).length == 1,
      s"fused expression duplicated:\n${plan.take(2000)}")
  }

  test("filter on a DERIVED column (keep) stays a single fused evaluation " +
    "via MaterializeFusedMeasures (pushdown would inline it 19x)") {
    val pages = graft.sources.Pages.load(spark, dir)
    val q = graft.operators.QualityFilter.run(pages)
      .filter(org.apache.spark.sql.functions.col("keep"))
    val plan = q.queryExecution.executedPlan.toString
    assert("fused_measures".r.findAllIn(plan).length == 1,
      s"fused expression duplicated by predicate pushdown:\n${plan.take(3000)}")
    // the repair is an eval_fence-materialized projection below the filter
    assert(plan.contains("eval_fence") || plan.contains("__fused_shared"),
      s"expected the materialized fence in the plan:\n${plan.take(2000)}")
  }

  test("fused call referenced from an Aggregate stays a single evaluation " +
    "(SPARK-36718 guard boundary, pinned so a rule-ordering change can't " +
    "silently reintroduce per-reference inlining)") {
    val pages = graft.sources.Pages.load(spark, dir)
    val q = graft.operators.QualityFilter.run(pages)
      .groupBy(col("lang_pred")).count()
    val plan = q.queryExecution.executedPlan.toString
    assert("fused_measures".r.findAllIn(plan).length == 1,
      s"fused expression duplicated under Aggregate:\n${plan.take(3000)}")
    assert(q.count() > 0)
  }

  test("a shared group formed ONLY in the projection list materializes " +
    "ABOVE a filter whose condition holds a distinct fused call — never " +
    "below it on pre-filter rows") {
    graft.plans.MaterializeFusedMeasures.register(spark)
    val pages = graft.sources.Pages.load(spark, dir)
      .select(col("url"), col("text"), col("lang"))
    // distinct call in the condition; a DIFFERENT call duplicated in the
    // projection — the old Project-over-Filter guard fired on ANY
    // condition call and put the list-only group below the filter
    val condCall = graft.functions.FusedMeasuresExpr(col("text"), false)
    val listCall = graft.functions.FusedMeasuresExpr(
      concat(col("text"), lit("x")), false)
    val q = pages
      .filter(length(condCall.getField("scrubbed_text")) > lit(0))
      .select(listCall.getField("scrubbed_text").as("a"),
        listCall.getField("stats").as("b"))
    val plan = q.queryExecution.executedPlan.toString
    // condition call single (1) + shared list call materialized once (1);
    // the FileScan line echoes the filter condition in DataFilters — a
    // print artifact, not an evaluation — so count non-scan lines only
    val evalLines = plan.linesIterator.filterNot(_.contains("FileScan")).mkString("\n")
    assert("fused_measures".r.findAllIn(evalLines).length == 2,
      s"expected exactly 2 fused evaluations:\n${plan.take(3000)}")
    val fenceAt = plan.indexOf("__fused_shared")
    val filterAt = plan.indexOf("Filter ")
    assert(fenceAt >= 0 && filterAt >= 0 && fenceAt < filterAt,
      s"list-only shared group materialized below the filter " +
        s"(fence@$fenceAt, filter@$filterAt):\n${plan.take(3000)}")
    assert(q.count() > 0)
  }

  test("fused expression equals the mapPartitions island row-for-row") {
    val pages = graft.sources.Pages.load(spark, dir).limit(200)
    val viaExpr = graft.operators.QualityFilter.run(pages)
      .select("url", "keep", "fail_reasons", "scrubbed_text", "lang_pred",
        "langid_score", "ppl", "quality_score")
      .collect().map(_.toString).sorted.toSeq
    val island = graft.functions.ModelScores
      .withAllMeasures(pages.drop("html"), "text", models = true)
    val st = org.apache.spark.sql.functions.col("__ts")
    val verdicts = graft.operators.QualityFilter
      .ruleVerdicts(graft.operators.QualityFilter.defaultRules, Some(st))
    val viaIsland = island
      .withColumn("quality_score",
        graft.functions.TextStats.measure("quality_score", st).get)
      .withColumn("keep", verdicts.map(_._2).reduce(_ && _))
      .withColumn("fail_reasons",
        graft.operators.QualityFilter.failReasons(verdicts))
      .select("url", "keep", "fail_reasons", "scrubbed_text", "lang_pred",
        "langid_score", "ppl", "quality_score")
      .collect().map(_.toString).sorted.toSeq
    assert(viaExpr == viaIsland)
  }

  test("date-partitioned pages: crawl-date filters prune partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("ppages").toString
    graft.sources.Pages.writePartitioned(
      graft.sources.Pages.load(spark, dir), tmp, urlBuckets = 4)
    val q = spark.read.parquet(tmp)
      .filter(col("warc_date") === "2024-01-05")
      .select(col("url"), length(col("text")))
    val plan = planOf(q)
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("warc_date"), s"no partition filter pushed:\n$pf")
    // the scan must read strictly fewer rows than the full table
    assert(q.count() > 0)
    val fullCount = spark.read.parquet(tmp).count()
    assert(q.count() < fullCount)
  }

  test("resume bucket jobs prune to their url_bucket partition files") {
    val tmp = java.nio.file.Files.createTempDirectory("rbuckets").toString
    val buckets = 4
    graft.sources.Pages.writePartitioned(
      graft.sources.Pages.load(spark, dir), tmp, urlBuckets = buckets)
    val layout = spark.read.parquet(tmp)
    // the per-bucket filter Resume.runBucketed issues on the layout
    val bucketJob = layout.filter(col("url_bucket") === 0)
      .select(col("url"), col("text"))
    val plan = planOf(bucketJob)
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("url_bucket"),
      s"bucket filter not a partition filter:\n$pf")
    // the bucket scan touches strictly fewer files than the full table —
    // i.e. resume is O(1 bucket) per bucket, not O(full corpus) per bucket
    def filesRead(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan.collectLeaves().map(_.metrics
        .get("numFiles").map(_.value).getOrElse(0L)).sum
    }
    val bucketFiles = filesRead(bucketJob)
    val allFiles = filesRead(layout.select(col("url"), col("text")))
    assert(bucketFiles > 0 && bucketFiles < allFiles,
      s"bucket scan reads $bucketFiles of $allFiles files")
    // end-to-end: runBucketed over the layout produces the same verdicts
    // as a direct run (and therefore read only pruned inputs per bucket)
    val out = java.nio.file.Files.createTempDirectory("rbout").toString
    graft.operators.Resume.runBucketed(spark, layout,
      s"$out/v", s"$out/m", "runP", buckets)
    val resumed = spark.read.parquet(s"$out/v").select("url", "keep")
      .collect().map(_.toString).sorted.toSeq
    val direct = graft.operators.QualityFilter.run(
      graft.sources.Pages.load(spark, dir)).select("url", "keep")
      .collect().map(_.toString).sorted.toSeq
    assert(resumed == direct)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val wh = java.nio.file.Files.createTempDirectory("warehouse").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val li = s2.read.parquet(s"$dir/lineitem.parquet")
    val o = s2.read.parquet(s"$dir/orders.parquet")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$wh/li_b").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$wh/o_b").saveAsTable("o_b")
    val joined = s2.table("li_b").join(s2.table("o_b"),
      col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join itself needs no Exchange (only the final
    // aggregation shuffles)
    val joinSection = plan.substring(0, plan.indexOf("FileScan"))
    assert(plan.contains("SortMergeJoin"))
    assert("Exchange hashpartitioning\\((l|o)_orderkey".r
      .findFirstIn(plan).isEmpty,
      s"bucketed join still shuffles on the join key:\n${plan.take(3000)}")
    assert(joined.count() == 5)
    s2.sql("DROP TABLE li_b"); s2.sql("DROP TABLE o_b")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the " +
    "final adaptive plan) — the engine's second skew defense besides the " +
    "explicit two-stage salt") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // production defaults scaled to fixture bytes: a partition is skewed
    // at 5x median AND > threshold; advisory size makes the split real
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    import s2.implicits._
    import org.apache.spark.sql.functions.{col => c, _}
    // one pathological key carries 80% of the fact rows (the "skewed
    // host" shape); a wide payload makes its partition dominate bytes
    val fact = s2.range(0, 100000)
      .select(when(c("id") < 80000, lit(0L)).otherwise(c("id")).as("k"),
        concat(lit("x" * 64), c("id")).as("payload"))
    val dim = s2.range(0, 100000).select(c("id").as("k"),
      concat(lit("d"), c("id")).as("dv"))
    // a GLOBAL aggregate downstream: a same-key groupBy above the join
    // would REQUIRE the join's hash partitioning, and AQE (correctly)
    // refuses to split a skewed partition another operator depends on —
    // the global agg imposes no distribution, so the split is legal.
    // sum(length(payload)) keeps the wide column flowing through the
    // join's shuffle (a bare count would prune it and deflate the skew)
    val joined = fact.join(dim, Seq("k"))
      .agg(sum(length(c("payload"))).as("m"))
    // execute THIS dataframe so its own AdaptiveSparkPlan finalizes
    assert(joined.collect().nonEmpty)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
    assert(finalPlan.contains("skew=true"),
      s"AQE did not mark/split the skewed partition:\n${finalPlan.take(3000)}")
  }

  test("semantic dedup shuffle shape: every vector-carrying exchange is " +
    "keyed by __cell, vectors shuffle at most once per side, and centroid " +
    "assignment is a narrow map (no exchange beneath it)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // fixture-scale joins all broadcast; disable so the plan shows the
    // shuffles a 100 TB run pays (same move as the band-shuffle pin)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val assigned = graft.operators.Similarity.assignCells(
        e.select(col("vec_id"), col("embedding")), "embedding",
        graft.operators.Similarity.sampleCentroids(e, "vec_id",
          "embedding", 8))
      val pairs = graft.operators.Similarity.cellPairs(
        assigned, "vec_id", "embedding", 10000)
      val shuffles = pairs.queryExecution.executedPlan.collect {
        case ex: ShuffleExchangeExec => ex
      }
      val vecShuffles = shuffles.filter(_.output.map(_.name).exists(n =>
        n == "embedding" || n.startsWith("__v")))
      assert(vecShuffles.nonEmpty, "expected cell-keyed vector exchanges")
      // (1) the only key vectors ever shuffle on is the cell
      vecShuffles.foreach { ex =>
        assert(ex.outputPartitioning.toString.contains("__cell"),
          s"vector exchange keyed off-cell: ${ex.outputPartitioning}")
      }
      // (2) narrow below: no VECTOR-carrying exchange under a vector
      // exchange — centroid assignment is a map over the scan, so each
      // side's vectors cross the network exactly once (the broadcast
      // build side of the cell-size join holds a narrow count exchange,
      // which is fine: it ships (cell, count, hub) rows, not vectors)
      vecShuffles.foreach { ex =>
        val below = ex.child.collect {
          case e2: ShuffleExchangeExec if e2.output.map(_.name).exists(n =>
            n == "embedding" || n.startsWith("__v")) => e2
        }
        assert(below.isEmpty,
          s"vectors shuffled twice:\n${ex.treeString.take(1500)}")
      }
      // (3) the hot-cell size aggregate ships no vectors
      val sizeShuffles = shuffles.filter(_.output.map(_.name).contains("__n"))
      sizeShuffles.foreach { ex =>
        assert(!ex.output.map(_.name).exists(n =>
          n == "embedding" || n.startsWith("__v")),
          s"cell-size aggregate shuffles vectors: ${ex.output.map(_.name)}")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("single-pass MAD aggregate matches the two-pass formulation") {
    import spark.implicits._
    val h = (1 to 9).map(i => ("en", i.toDouble,
      java.sql.Timestamp.valueOf(f"2024-01-0$i 00:00:00"))).toDF(
      "dim", "actual_value", "run_time")
      .unionByName(Seq(("fr", 5.0,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).toDF(
        "dim", "actual_value", "run_time"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("dim"), round(col("med"), 9), round(col("mad"), 9),
        col("last_value"), col("n").cast("long"), round(col("z_score"), 9))
        .collect().map(_.toString).sorted.toSeq
    val two = canon(AnomalyJob.madZScore(h, Some("dim")))
    val one = canon(AnomalyJob.madZScoreSinglePass(h, Some("dim")))
    assert(one == two)
    // and one Exchange instead of two for the single-pass plan
    val p1 = planOf(AnomalyJob.madZScoreSinglePass(h, Some("dim")))
    val p2 = planOf(AnomalyJob.madZScore(h, Some("dim")))
    assert("Exchange".r.findAllIn(p1).length <
      "Exchange".r.findAllIn(p2).length)
  }
}
