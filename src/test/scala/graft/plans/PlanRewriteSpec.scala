package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Extension layer: SQL function injection + the HOF->VecDot optimizer
  * rewrite. */
class PlanRewriteSpec extends SparkSpec {

  private lazy val installed = {
    org.apache.spark.sql.graft.bridge.installGraft(spark); true
  }

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(VectorFunctions.asDouble(a),
                       VectorFunctions.asDouble(b), (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x)

  test("vec_dot is callable from SQL after install") {
    assert(installed)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("optimizer rewrites the HOF dot-product pattern to VecDot") {
    assert(installed)
    val e = graft.Tables.load(spark, sfDir, "embeddings").limit(50)
    val q = e.select(hofDot(col("embedding"), col("embedding")).as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vecdot") || optimized.contains("VecDot"),
      s"rewrite did not fire:\n$optimized")
    // and values are identical to the un-rewritten form
    val viaKernel = q.collect().map(_.getDouble(0))
    val viaDirect = e.select(
        graft.functions.VecDot.vec_dot(col("embedding"), col("embedding"))
          .as("d")).collect().map(_.getDouble(0))
    assert(viaKernel.toSeq == viaDirect.toSeq)
  }

  test("rewrite leaves non-matching aggregates alone") {
    assert(installed)
    val e = graft.Tables.load(spark, sfDir, "embeddings").limit(10)
    // (x, y) -> x + y is NOT a dot product; must not be rewritten
    val q = e.select(aggregate(
      zip_with(VectorFunctions.asDouble(col("embedding")),
               VectorFunctions.asDouble(col("embedding")), (x, y) => x + y),
      lit(0.0), (acc, x) => acc + x).as("s"))
    val optimized = q.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!optimized.contains("vecdot"))
    q.collect() // still executes fine
  }

  test("GraftExtensions injects the same behavior at session build") {
    // builder().withExtensions on an existing context would just reuse the
    // default session; validate the extension object wires without error
    // (buildOptimizerRules is private[sql], so just exercise apply())
    val ext = new GraftExtensions
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext(holder) // throws if the injection signatures drift
  }
}
