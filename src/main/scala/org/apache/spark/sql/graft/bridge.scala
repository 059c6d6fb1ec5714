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

  /** Install graft's SQL function + optimizer rule into an EXISTING
    * session (extensions only apply at session build time). */
  def installGraft(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => {
        require(exprs.length == 2, "vec_dot takes exactly 2 arguments")
        graft.functions.VecDot(exprs(0), exprs(1))
      },
      "built-in")
    val sc = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!sc.experimental.extraOptimizations.contains(graft.plans.VecDotRewrite))
      sc.experimental.extraOptimizations =
        sc.experimental.extraOptimizations :+ graft.plans.VecDotRewrite
  }
}
