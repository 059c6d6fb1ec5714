package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained INNER equi-join view `V = L ⋈ R` over two
  * changelogs — the join-side counterpart of [[IncrementalAgg]]'s
  * delta-only GROUP BY upkeep. The reference materializes single tables
  * through its handlers (`/root/reference/cdc_manager.go:277-298`); a
  * real consumer almost always joins the fact topic to a dimension topic,
  * and recomputing that join per batch re-reads both full states. This
  * maintains it from deltas.
  *
  * Per micro-batch `(ΔL, ΔR)` the classic delta-join identity:
  * {{{
  *   L' = merge(L, ΔL)            R' = merge(R, ΔR)
  *   V' = V  ∖ (rows with l_pk ∈ keys(ΔL) ∨ joinKey ∈ keys(ΔR))
  *        ∪ live(L')[keys(ΔL)] ⋈ live(R')
  *        ∪ live(L')[∉ keys(ΔL)] ⋈ live(R')[keys(ΔR)]
  * }}}
  * Every touched view row is rebuilt from the POST-merge states, so
  * inserts, updates, deletes, AND late-arriving dimension rows (an order
  * that referenced a customer whose insert hadn't arrived yet simply
  * joins in the batch where the customer shows up) all fall out of one
  * formula — no per-op-type casework.
  *
  * Scale shape: the delta key sets are |Δ|-bounded and broadcast; the two
  * rebuild joins filter the big states down to delta-adjacent rows BEFORE
  * joining (semi/anti on broadcast key sets — scan-side, no shuffle of
  * the full state), so per-batch cost is O(|Δ| + |affected view rows|),
  * never O(|L| + |R|). State and view are `localCheckpoint`ed each batch
  * to truncate the replay lineage — on a real cluster use reliable
  * `checkpoint` (or the parquet/JDBC generation swap in [[CdcStream]])
  * so recovery does not recompute the chain.
  *
  * Keys are `Seq[String]` end to end — single-column covers the
  * reference's gorm-style integer pks, and composite pks (gorm models
  * flattened from multi-field structs, `cdc_utils.go:126-145`) thread
  * through the same joins positionally. */
object JoinView {

  /** Tombstone-aware L/R states + the current view rows. */
  final case class State(left: DataFrame, right: DataFrame, view: DataFrame)

  /** One micro-batch step. `viewCols` is the view projection (column
    * names from live(L) ++ live(R); must include `lPk` and `lJoinCols`).
    * `lJoinCols` is L's foreign key into R's primary key `rPk`, matched
    * positionally (`lJoinCols(i)` references `rPk(i)`). */
  def applyBatch(st: State, dl: DataFrame, dr: DataFrame,
                 lPk: Seq[String], rPk: Seq[String], lJoinCols: Seq[String],
                 viewCols: Seq[String]): State = {
    require(rPk.size == lJoinCols.size,
      s"lJoinCols (${lJoinCols.mkString(",")}) must match rPk " +
        s"(${rPk.mkString(",")}) positionally")
    // Contract: `dl`/`dr` must be cheap to re-scan (a materialized
    // foreachBatch Dataset, or a filter over a pinned log as in [[replay]])
    // — they are referenced by the merge, the changed-key sets, and three
    // broadcasts, so a delta carrying an expensive lineage would re-run it
    // per use.
    //
    // The L and R merges are independent — materialize their checkpoints
    // concurrently (two driver threads submitting to the same scheduler)
    // so the per-batch critical path is max(L, R) + view, not L + R + view.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val lNextF = Future(
      Materializer.merge(st.left, dl, lPk).localCheckpoint())
    val rNextF = Future(
      Materializer.merge(st.right, dr, rPk).localCheckpoint())
    val lNext = Await.result(lNextF, Duration.Inf)
    val rNext = Await.result(rNextF, Duration.Inf)
    val changedL = dl.select(lPk.map(k => col(s"after.$k").as(k)): _*)
      .distinct()
    val changedR = dr.select(rPk.map(k => col(s"after.$k").as(k)): _*)
      .distinct()
    val changedRAsFk = rPk.zip(lJoinCols).foldLeft(changedR) {
      case (df, (r, l)) => df.withColumnRenamed(r, l)
    }
    val keep = st.view
      .join(broadcast(changedL), lPk, "left_anti")
      .join(broadcast(changedRAsFk), lJoinCols, "left_anti")
    val liveL = Materializer.liveView(lNext)
    val liveR = Materializer.liveView(rNext)
    val joinCond = lJoinCols.zip(rPk)
      .map { case (l, r) => col(l) === col(r) }.reduce(_ && _)
    val rebuiltL = liveL.join(broadcast(changedL), lPk, "left_semi")
      .join(liveR, joinCond)
    val rebuiltR = liveL.join(broadcast(changedL), lPk, "left_anti")
      .join(liveR.join(broadcast(changedR), rPk, "left_semi"), joinCond)
    // The view is NOT eagerly pinned: unlike the states (each consumed by
    // several joins per batch), view_b is referenced exactly once — by
    // batch b+1's keep branch — so leaving it lazy folds the whole view
    // chain into one job at read time with no recomputation. Callers
    // maintaining views over MANY batches should pin periodically
    // (see [[replay]]'s pinEvery) to bound plan depth.
    val viewNext = keep
      .select(viewCols.map(col): _*) // using-joins reorder; restore
      .unionByName(rebuiltL.select(viewCols.map(col): _*))
      .unionByName(rebuiltR.select(viewCols.map(col): _*))
    State(lNext, rNext, viewNext)
  }

  /** Replay two event streams through the view in time-ordered windows:
    * `cuts = Seq(t1, t2, ...)` splits events into batches
    * `ts <= t1`, `t1 < ts <= t2`, ..., `ts > tn`. Returns the final
    * state after all batches. */
  def replay(lEvents: DataFrame, rEvents: DataFrame, cuts: Seq[Long],
             lPk: Seq[String], rPk: Seq[String], lJoinCols: Seq[String],
             viewCols: Seq[String]): State = {
    // AQE off for the replay loop, mirroring Structured Streaming's own
    // behavior (micro-batch plans are not adaptively re-planned): each
    // batch here is a small, known-shape plan over pinned inputs, and
    // AQE's stage-by-stage materialization only adds per-batch latency —
    // measured ~25% wall on this loop. The override lives on a CHILD
    // session (`newSession()`: shared SparkContext + catalog, independent
    // SQL conf) so the caller's session conf is never mutated — toggling
    // the shared conf raced with concurrent queries (a batch query
    // running mid-replay silently lost AQE) and two concurrent replays
    // could clobber each other's saved value.
    val parent = lEvents.sparkSession
    val child = parent.newSession()
    child.conf.set("spark.sql.adaptive.enabled", "false")
    // Re-root a pinned frame in the child so every derived plan is
    // analyzed and executed under the child's conf.
    def inChild(df: DataFrame): DataFrame =
      child.createDataFrame(df.rdd, df.schema)
    // Seed with truly-empty LocalRelations: limit(0) over the event
    // streams would carry the whole decode lineage into batch-1 analysis
    // (driver planning cost, repeated per derived frame). Only the SCHEMA
    // of the heavy plans is consulted; the data lineage starts empty.
    def emptyLike(df: DataFrame): DataFrame =
      child.createDataFrame(child.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                            df.schema)
    val lSchema = emptyLike(Materializer.compact(lEvents.limit(0), lPk))
    val rSchema = emptyLike(Materializer.compact(rEvents.limit(0), rPk))
    val emptyView = emptyLike(
      lSchema.drop(Materializer.MetaCols: _*)
        .join(rSchema.drop(Materializer.MetaCols: _*),
              lJoinCols.zip(rPk).map { case (l, r) => col(l) === col(r) }
                .reduce(_ && _))
        .select(viewCols.map(col): _*))
    // Pin the decoded logs ONCE (under the parent — their decode lineage
    // is regular batch work); each batch slice is then a cheap filter over
    // the pinned RDD (satisfying applyBatch's delta contract) instead of a
    // fresh envelope-decode lineage per batch per use.
    val lPinned = inChild(lEvents.localCheckpoint())
    val rPinned = inChild(rEvents.localCheckpoint())
    val windows = (Long.MinValue +: cuts) :+ Long.MaxValue
    val pinEvery = 8 // bound lazy-view plan depth on long replays
    val fin = windows.sliding(2).zipWithIndex
      .foldLeft(State(lSchema, rSchema, emptyView)) {
        case (st, (Seq(lo, hi), i)) =>
          def slice(ev: DataFrame) =
            ev.filter(col("ts") > lo && col("ts") <= hi)
          val next = applyBatch(st, slice(lPinned), slice(rPinned),
                                lPk, rPk, lJoinCols, viewCols)
          if ((i + 1) % pinEvery == 0)
            next.copy(view = next.view.localCheckpoint())
          else next
      }
    // Hand results back rooted in the caller's session: states are pinned
    // (re-root is free); the lazy view plan is physically planned under
    // the child (micro-batch semantics, AQE off) and wrapped as an RDD
    // scan, so downstream composition runs under the caller's own conf.
    State(parent.createDataFrame(fin.left.rdd, fin.left.schema),
          parent.createDataFrame(fin.right.rdd, fin.right.schema),
          parent.createDataFrame(fin.view.rdd, fin.view.schema))
  }
}
