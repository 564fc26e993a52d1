package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the classic
  * bridge lives in `private[sql]` ExpressionUtils. This shim (inside the
  * sql package tree) re-exports the two conversions our custom expressions
  * need — the standard pattern for libraries registering native
  * expressions without a SessionExtensions round-trip.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
