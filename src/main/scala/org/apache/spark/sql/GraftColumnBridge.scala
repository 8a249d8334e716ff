package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters in Spark 4
  * (columns are connect-agnostic now, so `new Column(expr)` is gone).
  * Standard extension-library practice: a tiny shim inside the sql
  * package namespace, nothing else lives here.
  */
object GraftColumnBridge {
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
