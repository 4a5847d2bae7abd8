package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversion — the
  * supported way for an external library to expose a custom Catalyst
  * Expression as a user-facing Column in Spark 4.x (the classic
  * `new Column(expr)` constructor is gone). */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
