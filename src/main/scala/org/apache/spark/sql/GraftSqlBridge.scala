package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` surface needed by graft's custom expression:
  * Column ↔ Expression conversion (classic.ExpressionUtils). Lives in the
  * spark.sql package solely to satisfy the access modifier — the standard
  * pattern for third-party Catalyst extensions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a (possibly custom) logical plan — the entry point a
    * custom LogicalPlan node needs (`Dataset.ofRows` is private[sql]). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan under a DataFrame (for wrapping it in a
    * custom logical node). */
  def plan(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]].logicalPlan
}
