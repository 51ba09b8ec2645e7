package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Anomaly detection over metric history: Median-Absolute-Deviation robust
  * z-score, exact reference parity (weiser/checks/anomaly.py:55-96):
  *
  *   M = 0.6745 * (last - median) / MAD,  with
  *   - truncate(MAD) == 0  => M = 0 (constant-series guard; Python int()
  *     truncates toward zero, MAD >= 0, so floor is equivalent)
  *   - fewer than 5 points => automatic fail, last value reported
  *   - history = up to `limit` oldest rows ordered by run_time
  *     (anomaly.py:127 LIMIT 10000 after ORDER BY run_time ASC)
  *   - per-dimension mode splits by the FIRST dimension only (anomaly.py:29)
  *
  * The reference copies each window into pandas + an in-memory DuckDB; here
  * it is one distributed aggregation: groupBy(dim).agg(median, last), then a
  * second pass for MAD = median(|x - med|) — exact medians (Spark 4
  * `median`), not percentile_approx, because DuckDB's mad() is exact-median
  * based (SURVEY.md §7.4).
  */
object AnomalyJob {

  /** Robust z-score per group. `history` must have columns
    * (groupCol?, actual_value, run_time).
    */
  def madZScore(history: DataFrame, dim: Option[String]): DataFrame = {
    val g = dim.map(d => Seq(col(d))).getOrElse(Nil)
    def grouped(df: DataFrame, aggs: Seq[Column]): DataFrame =
      if (g.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)

    val stats = grouped(history, Seq(
      median(col("actual_value")).as("med"),
      max_by(col("actual_value"), col("run_time")).as("last_value"),
      count(lit(1)).as("n")))

    val joined = dim match {
      case Some(d) => history.join(broadcast(stats), Seq(d))
      case None    => history.crossJoin(broadcast(stats))
    }
    val mads = (dim match {
      case Some(d) => joined.groupBy(col(d))
        .agg(median(abs(col("actual_value") - col("med"))).as("mad"))
      case None => joined
        .agg(median(abs(col("actual_value") - col("med"))).as("mad"))
    })
    val full = dim match {
      case Some(d) => stats.join(mads, Seq(d))
      case None    => stats.crossJoin(mads)
    }
    full.withColumn("z_score",
      when(floor(col("mad")) === 0, lit(0.0))
        .otherwise(lit(0.6745) * (col("last_value") - col("med")) / col("mad")))
  }

  /** Same statistics in ONE shuffle via the typed MadAggregate (the
    * two-pass variant above shuffles the history twice: once for the
    * median, once for MAD). Output schema matches madZScore.
    *
    * Round-7: the aggregator is applied through `functions.udaf` in a
    * plain `groupBy(dim)` instead of the Dataset `groupByKey` path. The
    * typed path inserted two AppendColumns nodes (whole-row object
    * (de)serialization per input row) and keyed the exchange on a
    * serialized string key, so the upstream history-cap window's hash
    * partitioning on the SAME dimension could never be reused; the
    * untyped groupBy keys on the native column — no object conversion,
    * and the planner drops the second exchange when the child is already
    * partitioned by `dim`.
    */
  private lazy val madUdaf = udaf(MadAggregate.agg,
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaLong))

  def madZScoreSinglePass(history: DataFrame, dim: Option[String]): DataFrame = {
    val s = madUdaf(col("actual_value"), unix_micros(col("run_time"))).as("s")
    val stats = dim match {
      case Some(d) => history.groupBy(col(d)).agg(s)
      // dim-less: a GLOBAL aggregate emits one row even on empty input;
      // drop the synthetic all-zero row so empty history produces zero
      // verdict rows, exactly like the grouped path (and the previous
      // groupByKey formulation)
      case None    => history.agg(s).filter(col("s.n") > 0)
    }
    val unpacked = stats.select(dim.toSeq.map(col) ++ Seq(
      col("s.median").as("med"), col("s.mad").as("mad"),
      col("s.last").as("last_value"), col("s.n").as("n")): _*)
    unpacked.withColumn("z_score",
      when(floor(col("mad")) === 0, lit(0.0))
        .otherwise(lit(0.6745) * (col("last_value") - col("med")) / col("mad")))
      .select((dim.toSeq.map(col) ++ Seq(col("med"), col("last_value"),
        col("n"), col("mad"), col("z_score"))): _*)
  }

  /** Full anomaly check over a metrics table, reference lifecycle
    * (anomaly.py:19-112): filter history by check_id prefix + optional
    * filter, cap at `limit` oldest rows, z-score, verdict; <5 points per
    * group => fail with the last value as actual_value.
    */
  def run(check: Check, metrics: DataFrame, limit: Int = 10000): DataFrame = {
    val prefix = check.checkId.getOrElse(
      throw new IllegalArgumentException("anomaly check requires check_id"))
    val dim = check.dimensions.headOption
    var h = metrics.filter(col("check_id").startsWith(prefix))
    check.filter.foreach(f => h = h.filter(expr(f)))
    // history cap: oldest `limit` rows by run_time (reference ORDER BY
    // run_time ASC LIMIT 10000). Dim-less: orderBy+limit plans as
    // TakeOrderedAndProject — per-partition top-k then a k-row merge, so
    // unbounded history never funnels into one window task. Dimensioned:
    // row_number window partitioned by the dim (parallel across dims).
    val hCapped = dim match {
      case None =>
        h.select(col("actual_value"), col("run_time"))
          .orderBy(col("run_time").asc).limit(limit)
      case Some(d) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col(d)).orderBy(col("run_time").asc)
        h.select(col(d), col("actual_value"), col("run_time"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= limit).drop("__rn")
    }
    // single-pass typed aggregate: one shuffle for (median, MAD, last, n)
    // instead of the two-pass built-in formulation (kept above as the
    // parity cross-check — PlanSpec asserts row-parity and exchange count)
    val z = madZScoreSinglePass(hCapped, dim)
    val verdict = Conditions.verdict(col("z_score"), check.condition, check.threshold)
    z.withColumn("success", when(col("n") < 5, lit(false)).otherwise(verdict))
      .withColumn("fail", !col("success"))
      // reference reports the last value as actual_value in both branches
      // (anomaly.py:103-112)
      .withColumn("actual_value", col("last_value"))
      .withColumn("name", dim match {
        case Some(d) => concat_ws("_", lit(check.name), lit(d), col(d).cast(StringType))
        case None    => lit(check.name)
      })
  }
}
