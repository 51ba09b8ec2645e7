package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-API seam: Spark 4 split `Column` from catalyst `Expression`
  * (Connect refactor), and the official bridge
  * (org.apache.spark.sql.classic.ExpressionUtils) is private[sql]. This
  * one-line forwarder lives in an org.apache.spark.sql subpackage to
  * expose it to graft's custom Catalyst expressions — the same visibility
  * technique Spark's own connectors use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
