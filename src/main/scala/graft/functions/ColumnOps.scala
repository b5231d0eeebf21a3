package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the Spark 4 unified `Column` (ColumnNode-backed) and
  * Catalyst `Expression`s, for building custom expressions and for
  * splicing columns into higher-order `expr(...)` strings.
  */
object ColumnOps {
  def toExpr(c: Column): Expression = GraftShims.toExpr(c)
  def toColumn(e: Expression): Column = GraftShims.toColumn(e)

  /** SQL text of a column, for interpolation into `expr` strings (lambda
    * bodies that the `functions._` surface can't express directly).
    */
  def sqlOf(c: Column): String = toExpr(c).sql
}
