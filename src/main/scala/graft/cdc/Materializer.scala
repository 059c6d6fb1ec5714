package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog -> current-state materialization: the analogue of what every
  * real handler does with the reference's `Create/Update/Delete` callbacks
  * (`/root/reference/cdc_manager.go:277-298`) — upsert into a store with
  * last-writer-wins per primary key.
  *
  * Implementation choice (scale-driven): `groupBy(pk).agg(max_by(...))`
  * rather than a `row_number()` window.
  *
  *  - max_by is a hash aggregate with MAP-SIDE PARTIAL AGGREGATION: each
  *    input partition reduces to at most one row per local key before the
  *    shuffle, so shuffle volume is bounded by |distinct keys|, not |events|.
  *    At 100 TB of changelog with a hot key set this is the difference
  *    between shuffling the log and shuffling the table.
  *  - row_number needs a full sort of every partition and shuffles ALL
  *    events. Same answer, strictly worse plan.
  *
  * Ordering is (ts, seq) — commit timestamp with a per-source monotonic
  * sequence as deterministic tie-break (Maxwell `ts` is epoch SECONDS,
  * `cdc_utils.go:18`, so same-second events are common).
  */
object Materializer {

  /** Fold a batch of change events `(op, ts, seq, before, after)` into the
    * current state: one row per key, deletes removed. The key is read from
    * `after` — valid for every op because deletes carry the row image in
    * `after` (quirk Q4, `cdc_manager.go:249-256`). */
  def currentState(events: DataFrame, primaryKey: Seq[String]): DataFrame = {
    val keyCols = primaryKey.map(k => col(s"after.$k").as(s"__k_$k"))
    val last = events
      .groupBy(keyCols: _*)
      .agg(max_by(struct(col("op"), col("after")),
                  struct(col("ts"), col("seq"))).as("last"))
    last.filter(col("last.op") =!= "delete").select("last.after.*")
  }

  /** Merge a (small) batch of change events into existing state — the
    * `foreachBatch` upsert body for streaming (SURVEY.md §7 stage 3).
    * Semantics: events win over prior state at equal ts via the `seq`
    * offset; prior state is replayed as ts = its materialization watermark.
    *
    * At scale: `state` is the big side (partitioned on pk by the previous
    * write); the per-batch `events` side is small. The union+agg re-shuffle
    * is avoided in production by writing state bucketed by pk so AQE can
    * plan a shuffle-free merge; in this sandbox we keep the plain agg. */
  def merge(state: DataFrame, stateTs: Long, events: DataFrame,
            primaryKey: Seq[String]): DataFrame = {
    val stateAsEvents = state.select(
      lit("insert").as("op"),
      lit(stateTs).as("ts"), lit(-1L).as("seq"),
      struct(state.columns.map(col): _*).as("after"))
    currentState(
      stateAsEvents.unionByName(
        events.select("op", "ts", "seq", "after")),
      primaryKey)
  }
}
