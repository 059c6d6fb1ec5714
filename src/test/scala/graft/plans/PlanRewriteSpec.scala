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

  test("sketch functions are callable from SQL and plan as ObjectHashAggregate") {
    assert(installed)
    spark.sql("SELECT id, CAST(id % 7 AS DOUBLE) AS v, " +
        "concat('t', id % 5) AS tok FROM range(1000)")
      .createOrReplaceTempView("sk_src")
    // KLL end-to-end through SQL: shard sketches, merge, quantile
    val kll = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(sk), 0.5D) AS p50,
        |       kll_count(kll_merge_agg(sk)) AS n
        |FROM (SELECT id % 4 AS shard, kll_sketch_agg(v) AS sk
        |      FROM sk_src GROUP BY 1)""".stripMargin)
    val kr = kll.head()
    assert(kr.getLong(1) == 1000L, "kll_count lost rows through merge")
    assert(kr.getDouble(0) >= 2.0 && kr.getDouble(0) <= 4.0,
      s"p50 of uniform 0..6 should be ~3, got ${kr.getDouble(0)}")
    // the aggregate must plan as ObjectHashAggregate (hash-based with
    // map-side partials) — SortAggregate would sort the whole input per
    // shuffle, the exact cost the sketch exists to avoid
    val plan = spark.sql(
      "SELECT kll_sketch_agg(v) FROM sk_src GROUP BY tok")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"KLL aggregate did not plan hash-based:\n$plan")
    // frequent-items end-to-end through SQL (exact regime: 5 tokens)
    val hh = spark.sql(
      """SELECT h.item, h.estimate
        |FROM (SELECT freq_merge_agg(sk) AS sk
        |      FROM (SELECT id % 4 AS shard, freq_sketch_agg(tok) AS sk
        |            FROM sk_src GROUP BY 1))
        |LATERAL VIEW explode(freq_items(sk)) AS h""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("t0" -> 200L, "t1" -> 200L, "t2" -> 200L,
                     "t3" -> 200L, "t4" -> 200L))
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
