package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` surfaces (the Spark 4 unified
  * Column hides Catalyst expressions behind ColumnNode, and DataFrame
  * construction from a LogicalPlan lives on the classic Dataset
  * companion). Kept to three one-line delegations so the private-API
  * surface we touch stays minimal and auditable.
  */
object GraftShims {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Wrap a (resolved) logical plan as a DataFrame — the entry point for
    * custom logical operators (e.g. graft.plans.AsOfJoin).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** What a `SparkSessionExtensions` instance would install — the
    * planner strategies and function names — exposed so specs can
    * verify `graft.GraftExtensions` without tearing down the shared
    * test session (extensions bind only at session instantiation; the
    * build methods are `private[sql]`).
    */
  def extensionStrategies(
      ext: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  def extensionFunctionNames(ext: SparkSessionExtensions): Seq[String] = {
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(reg).listFunction().map(_.funcName)
  }

  /** Register a custom expression as a SQL function on an existing
    * session (idempotent — re-registration overwrites with the same
    * builder). The builder-time equivalent is
    * `SparkSessionExtensions.injectFunction`; this covers sessions the
    * harness hands us already built.
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      "graft.functions", name)
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
