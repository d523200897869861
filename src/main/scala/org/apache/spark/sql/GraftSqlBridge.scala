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
}
