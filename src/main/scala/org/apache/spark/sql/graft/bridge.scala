package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression converters so graft's native
  * Catalyst expressions (`graft.functions.VecDot`) can surface as Columns.
  * Lives under `org.apache.spark.sql` purely for access; no Spark internals
  * are modified. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
