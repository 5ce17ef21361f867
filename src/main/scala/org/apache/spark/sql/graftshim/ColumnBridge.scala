package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column<->Expression converters (Spark 4 hides
  * them behind the Connect/classic split). Needed to surface custom native
  * expressions as Columns in the Scala API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — the classic
    * `Dataset.ofRows` is private[sql]; custom whole-operator nodes
    * (e.g. graft.plans.AsOfJoinNode) need it to enter the API surface.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Idempotently add a planner strategy to a LIVE session (the
    * `withExtensions(injectPlannerStrategy)` path only applies to
    * sessions built after the extension is registered).
    */
  def addStrategy(spark: org.apache.spark.sql.SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s)) exp.extraStrategies = exp.extraStrategies :+ s
  }

  /** Idempotently add an optimizer rule to a LIVE session (same
    * getOrCreate caveat as [[addStrategy]]).
    */
  def addOptimizerRule(spark: org.apache.spark.sql.SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(r)) exp.extraOptimizations = exp.extraOptimizations :+ r
  }

  /** Register functions into a LIVE session's registry — needed because
    * `getOrCreate()` ignores `withExtensions` when a session already
    * exists (sessionState is private[sql], hence this shim).
    */
  def registerFunctions(
      spark: org.apache.spark.sql.SparkSession,
      entries: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)]): Unit =
    entries.foreach { case (id, info, builder) =>
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
