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

  /** Re-root a DataFrame into another session over the SAME SparkContext
    * WITHOUT converting rows through the external `Row` format: the
    * result is a `LogicalRDD` scan over the source plan's InternalRow
    * RDD. (The public route — `target.createDataFrame(df.rdd, schema)` —
    * deserializes every row to external `Row` and re-encodes it on every
    * downstream scan; for a frame consumed several times per micro-batch
    * that conversion dominates.) The source should be pinned
    * (cached / localCheckpointed) or cheap: its physical plan is frozen
    * under the SOURCE session's conf at call time. */
  def reRoot(df: org.apache.spark.sql.DataFrame,
             target: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    val t = target.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    t.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }

  /** Install graft's SQL functions + optimizer rule into an EXISTING
    * session (extensions only apply at session build time). The
    * function table lives in `graft.plans.GraftFunctions`, shared with
    * the builder-time `GraftExtensions` path. */
  def installGraft(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.plans.GraftFunctions.all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    val sc = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!sc.experimental.extraOptimizations.contains(graft.plans.VecDotRewrite))
      sc.experimental.extraOptimizations =
        sc.experimental.extraOptimizations :+ graft.plans.VecDotRewrite
  }
}
