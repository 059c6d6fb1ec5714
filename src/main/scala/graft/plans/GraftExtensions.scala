package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.VecDot

/** Session extensions for the graft engine:
  *
  *  - `vec_dot(a, b)` exposed as a SQL function
  *  - [[VecDotRewrite]] injected into the optimizer
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. For an
  * already-built session use `org.apache.spark.sql.graft.bridge
  * .installGraft(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "vec_dot takes exactly 2 arguments")
        VecDot(exprs(0), exprs(1))
      }))
    e.injectOptimizerRule(_ => VecDotRewrite)
  }
}
