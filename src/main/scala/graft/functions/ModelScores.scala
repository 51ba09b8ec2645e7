package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** The one typed "Dataset island" in the pipeline: a single mapPartitions
  * pass that appends the model measures (language id + confidence +
  * perplexity) to any DataFrame carrying a text column.
  *
  * Why mapPartitions and not a UDF/Expression: the models are batch scorers
  * with non-trivial per-JVM state (profile matrices); partition-batched
  * scoring keeps them out of codegen'd expression trees while still
  * touching every row exactly once, with no shuffle (narrow dependency —
  * input partitioning is preserved). Equivalent role in the reference:
  * MEASURE() delegation to an external model (weiser/checks/numeric.py:18-26).
  */
object ModelScores {

  def withScores(df: DataFrame, textCol: String = "text"): DataFrame = {
    val outSchema = df.schema
      .add(StructField("lang_pred", StringType, nullable = false))
      .add(StructField("langid_score", DoubleType, nullable = false))
      .add(StructField("ppl", DoubleType, nullable = false))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.map { r =>
        val text = if (r.isNullAt(idx)) null else r.getString(idx)
        val (lang, conf) = LangId.predict(text)
        val ppl = Perplexity.perplexity(text)
        Row.fromSeq(r.toSeq ++ Seq(lang, conf, ppl))
      }
    }(Encoders.row(outSchema))
  }
}
