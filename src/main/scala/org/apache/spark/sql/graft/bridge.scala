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
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    // LogicalRDD.fromDataset CARRIES the source plan's output
    // partitioning and ordering into the scan node (rewritten onto the
    // new output attributes — the same mechanism Dataset.checkpoint
    // uses), so a frame pinned AFTER a hash-partitioning operation
    // (groupBy, repartition(col)) keeps that partitioning visible to
    // the planner across the re-root: per-round joins and re-groups on
    // the same key plan NO exchange on the pinned side. The previous
    // internalCreateDataFrame route dropped this to UnknownPartitioning,
    // silently re-shuffling every pinned state once per micro-batch.
    val plan = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      ds.queryExecution.toRdd, ds, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(t, plan)
  }

  /** Release the persisted storage pinned under a frame built from
    * `localCheckpoint` + [[reRoot]] — the explicit-eviction half the
    * lazy-pin discipline otherwise lacks (ContextCleaner frees pinned
    * blocks only when the RDD object is garbage collected, which an
    * evicting cache should not wait for). Walks each `LogicalRDD` leaf's
    * narrow ancestry a few steps (the reRoot wrapper can interpose a
    * scan/projection RDD over the checkpointed one) and unpersists
    * whatever is persisted. Only call on frames no live query will scan
    * again: a locally-checkpointed RDD is unrecoverable once dropped. */
  def unpersistPinned(df: org.apache.spark.sql.DataFrame): Unit = {
    def walk(rdd: org.apache.spark.rdd.RDD[_], depth: Int): Unit =
      if (depth < 6) {
        if (rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
          rdd.unpersist(blocking = false)
        rdd.dependencies.foreach(d => walk(d.rdd, depth + 1))
      }
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(walk(_, 0))
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
