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
    // Deliberately DROPS the source's output partitioning
    // (UnknownPartitioning): the re-root crosses a session boundary
    // where shuffle width usually changes (replay children run
    // batch-width partitions, callers run session width), and a
    // preserved foreign-width HashPartitioning composes badly with the
    // target session's AQE-coalesced exchanges (Spark's
    // PartitioningCollection requires all members to share
    // numPartitions — a preserved 8-wide side meeting a coalesced
    // 4-wide side crashes the SMJ's outputPartitioning). Inside a
    // SINGLE fixed-width, AQE-off loop use [[reRootPartitioned]].
    t.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }

  /** [[reRoot]] that PRESERVES the source plan's output partitioning and
    * ordering in the re-rooted scan (`LogicalRDD.fromDataset`, the
    * mechanism `Dataset.checkpoint` uses): a frame pinned AFTER a
    * hash-partitioning operation keeps that partitioning visible to the
    * planner, so per-round joins and re-groups on the same key plan NO
    * exchange on the pinned side. ONLY safe when producer and every
    * consumer run the SAME shuffle width with AQE off (a replay/
    * propagation loop on one child session) — see [[reRoot]] for why
    * the general session boundary must drop it. */
  def reRootPartitioned(df: org.apache.spark.sql.DataFrame,
                        target: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    val t = target.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
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

  /** True when the frame is STATICALLY known empty — an empty
    * LocalRelation, or a LogicalRDD over a zero-partition RDD (the
    * `createDataFrame(emptyRDD)` schema seeds every replay's batch-1
    * states are built from). Fold steps use it to skip the touched-key
    * collect and the anti/semi patch joins on a FROM-EMPTY (bootstrap)
    * batch. Purely a plan shortcut: a non-empty or undecidable frame
    * returns false and the general path runs; a true return never
    * changes semantics, only the plan. */
  def staticallyEmpty(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        lr.data.isEmpty
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.partitions.isEmpty
      case _ => false
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
