package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance over a CDC changelog — the classic
  * reason to consume a change stream: keep `GROUP BY` aggregates current
  * WITHOUT rescanning the base table. Every change event contributes
  * deltas:
  *
  *   insert  -> (+value, +1) at after's group
  *   delete  -> (-value, -1) at after's group (row image rides in `after`,
  *              quirk Q4)
  *   update  -> (-old value, -1) at before's group, (+new value, +1) at
  *              after's group — two deltas, so group-moving updates are
  *              handled; unchanged columns of the partial `before` (quirk
  *              Q3) are backfilled from `after`.
  *
  * Scale shape: one narrow map producing ≤2 delta rows per event, then a
  * map-side-partial SUM aggregation — shuffle bounded by |groups|, never
  * |events| or |base table|. This is what makes 100 TB-scale "revenue per
  * status, updated continuously" tractable: the base table is never read.
  *
  * Float caveat: incremental sums accumulate in event order, so they can
  * differ from a recompute in the last ulps (and a fully-deleted group
  * retains a ±1e-9 residue); compare rounded, and use `prune = true` to
  * drop groups whose live row count reached zero.
  */
object IncrementalAgg {

  /** SUM(valueCol) + COUNT(*) per groupCol, from change events alone. */
  def sumCount(events: DataFrame, groupCol: String, valueCol: String,
               prune: Boolean = true): DataFrame = {
    def img(side: String, c: String): Column =
      if (side == "before") coalesce(col(s"before.$c"), col(s"after.$c"))
      else col(s"after.$c")
    val ins = events.filter(col("op") === "insert").select(
      img("after", groupCol).as("g"),
      img("after", valueCol).as("dv"), lit(1L).as("dc"))
    val del = events.filter(col("op") === "delete").select(
      img("after", groupCol).as("g"),
      (-img("after", valueCol)).as("dv"), lit(-1L).as("dc"))
    val updNew = events.filter(col("op") === "update").select(
      img("after", groupCol).as("g"),
      img("after", valueCol).as("dv"), lit(1L).as("dc"))
    val updOld = events.filter(col("op") === "update").select(
      img("before", groupCol).as("g"),
      (-img("before", valueCol)).as("dv"), lit(-1L).as("dc"))
    val agg = ins.unionByName(del).unionByName(updNew).unionByName(updOld)
      .groupBy(col("g").as(groupCol))
      .agg(sum(col("dv")).as(s"sum_$valueCol"), sum(col("dc")).as("n_rows"))
    if (prune) agg.filter(col("n_rows") > 0) else agg
  }
}
