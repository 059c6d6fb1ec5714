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
    val lNext = Materializer.merge(st.left, dl, Seq(lPk)).localCheckpoint()
    val rNext = Materializer.merge(st.right, dr, Seq(rPk)).localCheckpoint()
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
    val viewNext = keep
      .select(viewCols.map(col): _*) // using-joins reorder; restore
      .unionByName(rebuiltL.select(viewCols.map(col): _*))
      .unionByName(rebuiltR.select(viewCols.map(col): _*))
      .localCheckpoint()
    State(lNext, rNext, viewNext)
  }

  /** Replay two event streams through the view in time-ordered windows:
    * `cuts = Seq(t1, t2, ...)` splits events into batches
    * `ts <= t1`, `t1 < ts <= t2`, ..., `ts > tn`. Returns the final
    * state after all batches. */
  def replay(lEvents: DataFrame, rEvents: DataFrame, cuts: Seq[Long],
             lPk: String, rPk: String, lJoinCol: String,
             viewCols: Seq[String]): State = {
    val lSchema = Materializer.compact(lEvents.limit(0), Seq(lPk))
    val rSchema = Materializer.compact(rEvents.limit(0), Seq(rPk))
    val emptyView = lSchema.drop(Materializer.MetaCols: _*)
      .join(rSchema.drop(Materializer.MetaCols: _*),
            col(lJoinCol) === col(rPk))
      .select(viewCols.map(col): _*).limit(0)
    val windows = (Long.MinValue +: cuts) :+ Long.MaxValue
    windows.sliding(2).foldLeft(State(lSchema, rSchema, emptyView)) {
      case (st, Seq(lo, hi)) =>
        def slice(ev: DataFrame) =
          ev.filter(col("ts") > lo && col("ts") <= hi)
        applyBatch(st, slice(lEvents), slice(rEvents),
                   lPk, rPk, lJoinCol, viewCols)
    }
  }
}
