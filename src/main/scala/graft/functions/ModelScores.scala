package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StringType, StructField}

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

  /** Trained quality-classifier probability as a column ([[QualityModel]]
    * — score SCRUBBED text in pipelines; the model treats scrub
    * placeholders as prose artifacts). Same mapPartitions island shape as
    * [[withScores]].
    */
  def withQualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val outSchema = df.schema
      .add(StructField("quality_prob", DoubleType, nullable = false))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.map { r =>
        val text = if (r.isNullAt(idx)) null else r.getString(idx)
        Row.fromSeq(r.toSeq :+ QualityModel.score(text))
      }
    }(Encoders.row(outSchema))
  }

  /** The whole measure surface in ONE island: model scores (optional),
    * text-stats vector, and scrubbed text, from a single UTF8String ->
    * String conversion per row. Separate UDFs each re-convert the text
    * column and re-assemble the row — at 100 TB those copies, not the
    * math, are the bill (profiled: fusing lifted local[32] throughput and
    * the 8->32 scaling ratio).
    */
  def withAllMeasures(df: DataFrame, textCol: String = "text",
                      models: Boolean = true): DataFrame = {
    val base = df.schema
      .add(StructField("__ts", ArrayType(IntegerType), nullable = false))
      .add(StructField("scrubbed_text", StringType, nullable = false))
    val outSchema =
      if (models) base
        .add(StructField("lang_pred", StringType, nullable = false))
        .add(StructField("langid_score", DoubleType, nullable = false))
        .add(StructField("ppl", DoubleType, nullable = false))
      else base
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.map { r =>
        val text = if (r.isNullAt(idx)) null else r.getString(idx)
        val stats = TextStats.compute(text).toSeq
        val scrubbed = Scrub.scrubString(text)
        val extra =
          if (models) {
            val (lang, conf) = LangId.predict(text)
            Seq(stats, scrubbed, lang, conf, Perplexity.perplexity(text))
          } else Seq(stats, scrubbed)
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(Encoders.row(outSchema))
  }
}
