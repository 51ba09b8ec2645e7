package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** One text-derived scalar as a native codegen'd Catalyst expression.
  *
  * The Column twins in [[Heuristics]] are pure Catalyst where Catalyst is
  * the right engine (regex classes, splits, arithmetic). For the counters
  * where the Catalyst formulation is asymptotically wrong — stopword
  * membership as an O(|stoplist|) `array_contains` scan per word, distinct
  * char n-grams as an O(n) array materialization — the twin routes through
  * the same allocation-free static JVM counters the fused production
  * expression uses ([[TextStats]]), keeping value parity with the fused
  * path and the DuckDB oracles by construction. `doGenCode` emits a single
  * static call, so the expression stays inside whole-stage codegen
  * (PlanSpec pins the span); null text evaluates as "" like every
  * `coalesce(text, '')` twin.
  *
  * `fn` is closed over [[TextScalarExpr.fns]] — each entry names a static
  * method on [[TextStats]] taking the raw UTF8String.
  */
case class TextScalarExpr(child: Expression, fn: String)
    extends UnaryExpression {

  private val spec = TextScalarExpr.fns.getOrElse(fn,
    throw new IllegalArgumentException(
      s"unknown text scalar '$fn' (known: ${TextScalarExpr.fns.keys.mkString(", ")})"))

  override def nullable: Boolean = false
  override def prettyName: String = fn
  override def dataType: DataType = spec.dataType

  override def eval(input: InternalRow): Any =
    spec.eval(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val jt = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(spec.dataType)
    ev.copy(
      code = code"""
        ${c.code}
        $jt ${ev.value} = graft.functions.TextStats.${spec.method}(
          ${c.isNull} ? null : ${c.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextScalarExpr {
  final case class Spec(method: String, dataType: DataType,
                        eval: UTF8String => Any)

  val fns: Map[String, Spec] = Map(
    "stop_hits" -> Spec("stopHits", IntegerType, TextStats.stopHits _),
    "word_count" -> Spec("wordCount", IntegerType, TextStats.wordCount _),
    "word_repetition" -> Spec("wordRepetition", DoubleType,
      TextStats.wordRepetition _),
    "nospace_count" -> Spec("noSpaceCount", IntegerType,
      TextStats.noSpaceCount _),
    "nospace_stop_cover" -> Spec("noSpaceStopCover", IntegerType,
      TextStats.noSpaceStopCover _),
    "char4_dup_fraction" -> Spec("char4DupFraction", DoubleType,
      TextStats.char4DupFraction _)
  )

  def apply(text: Column, fn: String): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      TextScalarExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), fn))
}
