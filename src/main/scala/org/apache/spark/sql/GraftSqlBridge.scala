package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface that custom logical plans
  * need: building a DataFrame from a hand-constructed LogicalPlan and
  * extracting the Catalyst expression behind a public Column. Both are the
  * classic (non-Connect) implementations this engine always runs on; the
  * bridge is the entire private-API footprint of the project, kept in one
  * file on purpose.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eagerly convert a public Column to its Catalyst expression through the
    * session's converter (`ExpressionUtils.expression` would wrap it in a
    * lazy ColumnNodeExpression the analyzer cannot see through inside a
    * custom logical node).
    */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Session-free Column↔Expression conversions for expression-valued
    * helpers (e.g. `Tokenizer.segment`) that run before any session is in
    * scope. `ExpressionUtils.expression` suffices when the column is a
    * plain attribute/function tree (no session-specific resolution).
    */
  def expressionNoSpark(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
