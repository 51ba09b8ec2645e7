package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Verdict-agreement evaluation — the measurement half of the north
  * rule's acceptance metric ("keep/drop F1 >= 0.99 vs reference labels").
  * One inner join on the document key + one aggregation: the counts
  * shuffle is O(1) rows, so this runs at corpus scale next to the
  * pipeline it scores.
  */
object Eval {

  final case class KeepF1(
      n: Long, truePos: Long, falsePos: Long, falseNeg: Long) {
    def precision: Double =
      if (truePos + falsePos == 0) 0.0
      else truePos.toDouble / (truePos + falsePos)
    def recall: Double =
      if (truePos + falseNeg == 0) 0.0
      else truePos.toDouble / (truePos + falseNeg)
    def f1: Double = {
      val p = precision; val r = recall
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
  }

  /** F1 of predicted keep labels against reference labels, joined on
    * `keyCol` (keep = positive class). Rows present on only one side are
    * excluded by the inner join — count them separately if coverage
    * matters.
    */
  def keepF1(pred: DataFrame, ref: DataFrame, keyCol: String = "url",
             labelCol: String = "keep"): KeepF1 = {
    val j = pred.select(col(keyCol), col(labelCol).as("__p"))
      .join(ref.select(col(keyCol), col(labelCol).as("__r")), Seq(keyCol))
    val row = j.agg(
      count(lit(1)).as("n"),
      sum(when(col("__p") && col("__r"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("__p") && !col("__r"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("__p") && col("__r"), 1L).otherwise(0L)).as("fn")).head()
    KeepF1(row.getAs[Long]("n"), row.getAs[Long]("tp"),
      row.getAs[Long]("fp"), row.getAs[Long]("fn"))
  }
}
