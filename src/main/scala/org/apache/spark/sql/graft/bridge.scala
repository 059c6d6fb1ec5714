package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression conversions, so
  * graft's custom Catalyst expressions (e.g. `VecDot`) can surface as
  * normal `Column`s. Lives in the org.apache.spark.sql namespace solely
  * for access; contains no Spark-internal logic. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
