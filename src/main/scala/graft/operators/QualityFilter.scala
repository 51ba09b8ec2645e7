package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.{Condition, Conditions}
import graft.functions.{Heuristics, ModelScores, Scrub}

/** Per-row quality rule: the weiser Check shape (name / measure / condition
  * / threshold, cf. weiser/loader/models.py:79-100) recast as a PER-DOCUMENT
  * predicate instead of a per-table aggregate. This is the architectural
  * inversion (SURVEY.md §7.1): the reference runs one aggregate query per
  * check; at web scale we run ONE pass over pages evaluating every check as
  * a column.
  */
final case class RowRule(
    name: String,
    measure: String,
    condition: Condition,
    threshold: Either[Double, (Double, Double)])

object RowRule {
  /** A per-row rule from a YAML Check (the weiser config shape): the
    * check's `measure` resolves through the per-row measure registry.
    * Lets the whole quality filter be declared as a checks: block.
    */
  def fromCheck(c: graft.plans.Check): RowRule = {
    require(c.measure.nonEmpty, s"row rule ${c.name} requires a measure")
    RowRule(c.name, c.measure.get, c.condition, c.threshold)
  }
}

object QualityFilter {

  /** Named per-row measure registry (the MEASURE() analog,
    * weiser/checks/numeric.py:18-26): measure name -> Column. Heuristics are
    * pure Catalyst; `langid_score` and `ppl` reference columns materialized
    * by ModelScores in the same pass.
    */
  def measureColumn(measure: String): Column = measure match {
    case "doc_length"            => Heuristics.docLength(col("text")).cast(DoubleType)
    case "word_count"            => Heuristics.wordCount(col("text")).cast(DoubleType)
    case "token_count"           => Heuristics.tokenCount(col("text")).cast(DoubleType)
    case "symbol_word_ratio"     => Heuristics.symbolWordRatio(col("text"))
    case "stopword_fraction"     => Heuristics.stopwordFraction(col("text"))
    case "word_repetition_ratio" => Heuristics.wordRepetitionRatio(col("text"))
    case "script_nospace_fraction" => Heuristics.scriptNoSpaceFraction(col("text"))
    case "symbol_ratio_adaptive" => Heuristics.symbolRatioAdaptive(col("text"))
    case "stopword_fraction_adaptive" =>
      Heuristics.stopwordFractionAdaptive(col("text"))
    case "repetition_adaptive"   => Heuristics.repetitionAdaptive(col("text"))
    case "dup_2gram_fraction"    => Heuristics.dup2gramFraction(col("text"))
    case "dup_line_fraction"     => Heuristics.dupLineFraction(col("text"))
    case "mean_word_length"      => Heuristics.meanWordLength(col("text"))
    case "upper_fraction"        => Heuristics.upperFraction(col("text"))
    case "digit_fraction"        => Heuristics.digitFraction(col("text"))
    case "quality_score"         => Heuristics.qualityScore(col("text"))
    case other                   => expr(other).cast(DoubleType) // column ref or SQL expr
  }

  /** Default rule set; thresholds frozen — they define the keep/drop
    * semantics the F1 target is measured against.
    */
  val defaultRules: Seq[RowRule] = Seq(
    RowRule("min_doc_length", "doc_length", Condition.Ge, Left(100)),
    // round 6: the three word-based rules became script-ADAPTIVE (rule
    // names frozen — they key check ids, lineage and fail_reasons; only
    // the measure changed). Word rules read unsegmented zh/ja/th prose as
    // one giant word and dropped those languages wholesale; the adaptive
    // measures switch to char-based twins for no-space-script-dominant
    // documents and are byte-identical to the old measures on every
    // space-script document (the branch condition is false there).
    RowRule("max_symbol_word_ratio", "symbol_ratio_adaptive", Condition.Le, Left(0.1)),
    RowRule("min_stopword_fraction", "stopword_fraction_adaptive", Condition.Ge, Left(0.01)),
    RowRule("max_word_repetition", "repetition_adaptive", Condition.Le, Left(0.95)),
    RowRule("max_dup_2gram", "dup_2gram_fraction", Condition.Le, Left(0.5)),
    RowRule("max_dup_line_fraction", "dup_line_fraction", Condition.Le, Left(0.3)),
    // band re-frozen for the round-3 interpolated trigram LM (sharper
    // model => lower natural-text ppl): fixture prose spans 1.9-8.4
    // (non-Latin scripts fold to the degenerate low end), code blocks
    // start at ~390, symbol soup at ~4400
    RowRule("perplexity_band", "ppl", Condition.Between, Right((1.3, 300.0))),
    // langid_score is the MARGIN-based confidence (round 4): a two-way
    // softmax on the per-gram top1-top2 score margin, range [0.5, 1).
    // Unlike the round-3 full softmax — whose values shrank mechanically
    // every time a language was added — the margin reads only the two
    // best languages, so this threshold is |langs|-STABLE: growing the
    // model does not silently loosen or tighten the rule. 0.51 re-frozen
    // from measured distributions: clean prose in all 10 languages sits
    // >= 0.537, the four ambiguous mixed-script fixture docs the old rule
    // dropped sit at 0.503-0.507 (still dropped), near-tie synthetic soup
    // sits at 0.50-0.51.
    RowRule("min_langid_score", "langid_score", Condition.Ge, Left(0.51))
  )

  /** Heuristic-only subset (no model columns) — SQL-expressible, used by
    * the DuckDB-oracled pipeline query.
    */
  val heuristicRules: Seq[RowRule] =
    defaultRules.filterNot(r => r.measure == "ppl" || r.measure == "langid_score")

  /** Verdict columns for a rule set: (ruleName -> boolean pass Column).
    * NULL measure => fail, inherited from Conditions.verdict
    * (reference None=>False rule, weiser/checks/base.py:49-50).
    * When a stats struct column is supplied, text measures resolve to its
    * fields (one text pass total) instead of standalone expression trees.
    */
  def ruleVerdicts(rules: Seq[RowRule],
                   stats: Option[Column] = None): Seq[(String, Column)] =
    rules.map { r =>
      val m = stats.flatMap(st => graft.functions.TextStats.measure(r.measure, st))
        .getOrElse(measureColumn(r.measure))
      r.name -> Conditions.verdict(m, r.condition, r.threshold)
    }

  /** fail_reasons array in rule-declaration order (deterministic). */
  def failReasons(verdicts: Seq[(String, Column)]): Column =
    filter(
      array(verdicts.map { case (n, v) => when(!v, lit(n)) }: _*),
      x => x.isNotNull)

  /** The one-pass pipeline: model scores -> heuristic verdict columns ->
    * keep/fail_reasons -> scrubbed text. Narrow dependencies only: NO
    * shuffle from parquet scan to output, and the whole pass is a single
    * native Catalyst expression (functions.FusedMeasuresExpr) inside
    * whole-stage codegen — passthrough columns never convert to external
    * objects and Catalyst prunes the scan to the referenced columns
    * (`html` is never read; PlanSpec/PipelineSpec assert both).
    */
  def run(pages: DataFrame, rules: Seq[RowRule] = defaultRules): DataFrame = {
    // single-evaluation guard for sessions built WITHOUT
    // spark.sql.extensions=graft.GraftExtensions: a later filter on a
    // derived column (`.filter(col("keep"))`) would otherwise inline the
    // fused expression once per verdict reference via predicate pushdown
    // (measured 19x). experimental.extraOptimizations is the public
    // per-session seam for exactly this; registering is idempotent.
    graft.plans.MaterializeFusedMeasures.register(pages.sparkSession)
    val needsModels = rules.exists(r =>
      r.measure == "ppl" || r.measure == "langid_score")
    // ONE fused expression computes model scores, the text-stats vector
    // and the scrubbed text from a single text conversion per row;
    // verdicts, fail_reasons and the quality score are then cheap Column
    // reads of the stats vector
    val base = pages.drop("html").withColumn("__m",
      graft.functions.FusedMeasuresExpr(col("text"), needsModels))
    val common = base
      .withColumn("__ts", col("__m.stats"))
      .withColumn("scrubbed_text", col("__m.scrubbed_text"))
    val scored =
      if (needsModels) common
        .withColumn("lang_pred", col("__m.lang_pred"))
        .withColumn("langid_score", col("__m.langid_score"))
        .withColumn("ppl", col("__m.ppl"))
        .drop("__m")
      else common.drop("__m")
    val st = col("__ts")
    val verdicts = ruleVerdicts(rules, Some(st))
    val keep = verdicts.map(_._2).reduce(_ && _)
    scored
      .withColumn("quality_score",
        graft.functions.TextStats.measure("quality_score", st).get)
      .withColumn("keep", keep)
      .withColumn("fail_reasons", failReasons(verdicts))
      .drop("__ts")
  }

  /** Per-host keep/drop statistics with EXPLICIT SALTING (north rule: a
    * handful of hosts dominate a web crawl; a plain groupBy(host) puts an
    * entire hot host in one reducer). Two-stage aggregation: partial
    * combine on (host, salt) — bounded fan-in per reducer regardless of
    * host skew — then final combine on host. Counts are associative, so
    * the result is identical to the direct groupBy (PipelineSpec asserts
    * this); AQE's skew handling stays on as the runtime backstop.
    */
  def hostStats(verdictDf: DataFrame, salts: Int = 16): DataFrame =
    verdictDf
      .withColumn("host", regexp_extract(col("url"), "https?://([^/]+)/", 1))
      .withColumn("__salt", pmod(xxhash64(col("url")), lit(salts)))
      .groupBy(col("host"), col("__salt"))
      .agg(count(lit(1)).as("pn"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("pk"))
      .groupBy(col("host"))
      .agg(sum(col("pn")).as("doc_count"),
        sum(col("pk")).as("keep_count"))
      .withColumn("keep_rate",
        round(col("keep_count").cast(DoubleType) /
          col("doc_count").cast(DoubleType), 6))

  /** Per-bucket lineage metrics in the spirit of the reference's metric
    * rows (weiser/checks/base.py:86-138): one row per (url_bucket, rule)
    * with fail counts, plus doc/pass/fail summary counts per bucket. A
    * single map-side-combinable aggregation — the shuffle moves only
    * O(buckets × rules) rows regardless of corpus size.
    *
    * The lineage key is the DETERMINISTIC url bucket (Pages.urlBucket) —
    * a pure function of the row, NOT spark_partition_id(), so metric rows
    * (and their dedup ids) are invariant under parallelism, repartitioning
    * and restarts, and the DuckDB oracle can re-derive them.
    */
  def partitionMetrics(verdictDf: DataFrame, rules: Seq[RowRule],
                       runId: String, runTime: java.sql.Timestamp,
                       buckets: Int = 32): DataFrame = {
    val perRule = rules.map(r =>
      sum(when(array_contains(col("fail_reasons"), r.name), 1L).otherwise(0L))
        .as(s"__f_${r.name}"))
    val base = verdictDf
      .withColumn("url_bucket",
        graft.sources.Pages.urlBucket(col("url"), buckets))
      .groupBy(col("url_bucket"))
      .agg(count(lit(1)).as("doc_count"),
        (sum(when(col("keep"), 1L).otherwise(0L)).as("pass_count") +: perRule): _*)
    val stackExpr = rules
      .map(r => s"'${r.name}', `__f_${r.name}`")
      .mkString(s"stack(${rules.size}, ", ", ", ")")
    base.select(col("url_bucket"), col("doc_count"), col("pass_count"),
        expr(stackExpr).as(Seq("name", "actual_value")))
      .withColumn("fail_count", col("doc_count") - col("pass_count"))
      .withColumn("success", col("actual_value") === 0)
      .withColumn("fail", !col("success"))
      .withColumn("run_id", lit(runId))
      .withColumn("run_time", lit(runTime))
      .withColumn("check_id",
        sha2(concat(lit("pages"), col("name"), col("url_bucket").cast(StringType)), 256))
      .withColumn("id", sha2(concat(col("check_id"), col("run_id")), 256))
      .select("id", "check_id", "name", "url_bucket", "actual_value",
        "doc_count", "pass_count", "fail_count", "success", "fail",
        "run_id", "run_time")
  }
}
