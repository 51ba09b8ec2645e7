package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.BooleanType

import graft.functions.FusedMeasuresExpr

/** SparkSessionExtensions entry point — the standard plug-in seam for
  * custom Catalyst surfaces. Sessions built with
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * get graft's native expression as a SQL function, so pure-SQL users can
  * run the fused quality pipeline without the Scala API:
  *
  *   SELECT url, fused_measures(text, true).lang_pred,
  *          fused_measures(text, true).scrubbed_text ...
  *
  * (The Scala API builds the expression directly and does not require the
  * extension; see operators/QualityFilter.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // one evaluation for N syntactically-repeated fused_measures(...)
    // calls in a SELECT (and for conditions pushdown rebuilt from
    // aliases) — see plans/MaterializeFused.scala
    ext.injectOptimizerRule(_ => graft.plans.MaterializeFusedMeasures)
    ext.injectFunction((
      new FunctionIdentifier("fused_measures"),
      new ExpressionInfo("graft.functions.FusedMeasuresExpr",
        "fused_measures"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.size <= 2,
          "fused_measures(text[, include_model_scores])")
        val models = args.lift(1).forall {
          case Literal(b: Boolean, BooleanType) => b
          case other => throw new IllegalArgumentException(
            s"fused_measures: second argument must be a boolean literal, got $other")
        }
        FusedMeasuresExpr(args.head, models)
      }))
  }
}
