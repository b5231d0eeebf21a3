package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversion (the
  * Spark 4 unified Column hides Catalyst expressions behind ColumnNode).
  * Kept to two one-line delegations so the private-API surface we touch
  * stays minimal and auditable.
  */
object GraftShims {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
