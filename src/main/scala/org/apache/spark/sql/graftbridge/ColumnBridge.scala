package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column ↔ Expression converters, needed to
  * expose custom Catalyst expressions (e.g. graft.functions.TransliterateExpr)
  * as user-facing Columns. Lives under org.apache.spark.sql to satisfy the
  * private[sql] access scope; contains no logic of its own. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
