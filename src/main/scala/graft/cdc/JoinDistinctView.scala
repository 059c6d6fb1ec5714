package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained COUNT(DISTINCT) OVER A JOIN —
  * `γ_{g; count(distinct v)}(L ⋈ R)` from two changelogs: "distinct
  * customers with a live order, per nation", exact under deletes. The
  * non-subtractable composition: [[JoinAggView]]'s retract/insert
  * delta-join rows feed [[IncrementalAgg]]'s net pair-multiplicity state
  * instead of a sum fold — a delete of a customer's LAST live order drops
  * them from the count (which no sketch over the join can answer), while
  * other orders keep the (group, customer) pair's multiplicity positive.
  *
  * State: `(L, R, pairs(g, v, net), groups(g, n_rows))` — the pair table
  * is bounded by the live (group, value) cardinality of the JOIN, never
  * by |join rows| (multiplicities are summed); per-batch shuffle is
  * bounded by delta-adjacent join rows (the same two-branch broadcast
  * restriction as JoinAggView) plus the touched pairs. NULL discipline
  * matches `COUNT(DISTINCT v)`: NULL values form no pair, but live
  * groups whose values are all NULL still report 0.
  */
object JoinDistinctView {

  /** Tombstone-aware L/R states + the pair-multiplicity distinct state. */
  final case class State(left: DataFrame, right: DataFrame,
                         pairs: DataFrame, groups: DataFrame)

  /** Public face: `groupCol, n_distinct_<valueCol>` over live groups —
    * exactly [[IncrementalAgg.distinctCountView]]'s schema. */
  def view(st: State, groupCol: String, valueCol: String): DataFrame =
    IncrementalAgg.distinctCountView(
      IncrementalAgg.DistinctState(st.pairs, st.groups), groupCol, valueCol)

  /** The maintained pair state IS a [[IncrementalAgg.DistinctState]], so
    * the whole non-subtractable family over the JOIN rides the same
    * state: exact MIN/MAX per group under deletes ("cheapest live order
    * per nation" stays right when the cheapest is deleted)… */
  def minMaxView(st: State, groupCol: String, valueCol: String): DataFrame =
    IncrementalAgg.minMaxView(
      IncrementalAgg.DistinctState(st.pairs, st.groups), groupCol, valueCol)

  /** …and exact discrete PERCENTILES per group (see
    * [[IncrementalAgg.percentileView]] — one g-partitioned window pass
    * over the live pairs, multiplicities summed, never exploded). */
  def percentileView(st: State, groupCol: String, valueCol: String,
                     ps: Seq[Double]): DataFrame =
    IncrementalAgg.percentileView(
      IncrementalAgg.DistinctState(st.pairs, st.groups), groupCol, valueCol,
      ps)

  /** One micro-batch step — JoinAggView's delta-join restriction, folded
    * into the additive pair state. Same delta contract: `dl`/`dr` must be
    * cheap to re-scan. */
  def applyBatch(st: State, dl: DataFrame, dr: DataFrame,
                 lPk: Seq[String], rPk: Seq[String], lJoinCols: Seq[String],
                 groupCol: String, valueCol: String,
                 keys: Option[(Option[DataFrame], Option[DataFrame])] = None,
                 maxLocalKeys: Int = JoinView.DefaultMaxLocalKeys): State = {
    val (ctx, lNext, rNext) = MultiView.batchCtx(st.left, st.right, dl, dr,
      lPk, rPk, lJoinCols, keys, maxLocalKeys)
    val (pairs, groups) = stepPairs(st.pairs, st.groups, ctx,
                                    groupCol, valueCol)
    State(lNext, rNext, pairs, groups)
  }

  /** The pair-state-specific half of a batch (shared verbatim between
    * [[applyBatch]] and the [[MultiView]] fan-out via [[maintainer]]). */
  private[cdc] def stepPairs(pairs: DataFrame, groups: DataFrame,
                             ctx: MultiView.BatchCtx,
                             groupCol: String, valueCol: String)
      : (DataFrame, DataFrame) = {
    def touched(liveL: DataFrame, liveR: DataFrame, w: Int): DataFrame =
      JoinAggView.touchedJoinRows(liveL, liveR, ctx.changedL, ctx.lLocal,
        ctx.changedR, ctx.rLocal, ctx.lPk, ctx.rPk, ctx.lJoinCols,
        Seq(groupCol),
        Seq((valueCol, valueCol,
             scala.Predef.identity[org.apache.spark.sql.Column] _)), w)
    // FROM-EMPTY (bootstrap) fold: empty pair/group states mean the
    // pre-merge join is empty (state invariant), so the retract branch
    // and the changed-key restrictions are pure overhead — the delta is
    // the full post-merge join weighted +1, and mergeAdditive below
    // takes its own from-empty shortcut (bridge.staticallyEmpty
    // contract: plan-only).
    val bbr = org.apache.spark.sql.graft.bridge
    if (bbr.staticallyEmpty(pairs) && bbr.staticallyEmpty(groups)) {
      val fkJ = MultiView.FkJoin(ctx.lPk, ctx.rPk, ctx.lJoinCols)
      val insert0 = fkJ.joinBoundedL(ctx.liveL, ctx.liveR, ctx.lLocal)
        .select(col(groupCol).as("g"), col(valueCol).as("v"),
                lit(1L).as("w"))
      val pairsAll0 = insert0.groupBy(col("g"), col("v"))
        .agg(sum(col("w")).as("net"))
        .localCheckpoint(false)
      val dPairs0 = pairsAll0.filter(col("v").isNotNull && col("net") =!= 0)
      val dGroups0 = pairsAll0.groupBy(col("g"))
        .agg(sum(col("net")).as("n_rows"))
        .filter(col("n_rows") =!= 0)
      return (IncrementalAgg.mergeAdditive(pairs, dPairs0, Seq("g", "v"),
                                           Seq("net"), ctx.maxLocalKeys),
              IncrementalAgg.mergeAdditive(groups, dGroups0, Seq("g"),
                                           Seq("n_rows"), ctx.maxLocalKeys))
    }
    val retract = touched(ctx.preLiveL, ctx.preLiveR, -1)
    val insert = touched(ctx.liveL, ctx.liveR, +1)
    // ONE shuffle over the weighted delta-join rows: aggregate to (g, v)
    // net multiplicities first (NULL v keeps its own row so group liveness
    // counts every row), pin THAT — it is |touched pairs|-sized, far
    // smaller than the rows — and derive both additive merges from it.
    // The g roll-up re-aggregates the pinned partials instead of paying a
    // second full-width shuffle of the delta-join rows.
    val rows = retract.unionByName(insert)
      .select(col(groupCol).as("g"), col(s"__v_$valueCol").as("v"),
              col("__w").cast("long").as("w"))
    val pairsAll = rows.groupBy(col("g"), col("v"))
      .agg(sum(col("w")).as("net"))
      .localCheckpoint(false)
    val dPairs = pairsAll.filter(col("v").isNotNull && col("net") =!= 0)
    val dGroups = pairsAll.groupBy(col("g")).agg(sum(col("net")).as("n_rows"))
      .filter(col("n_rows") =!= 0)
    (IncrementalAgg.mergeAdditive(pairs, dPairs, Seq("g", "v"),
                                  Seq("net"), ctx.maxLocalKeys),
     IncrementalAgg.mergeAdditive(groups, dGroups, Seq("g"),
                                  Seq("n_rows"), ctx.maxLocalKeys))
  }

  /** This pair-state family as a [[MultiView.Maintainer]] — state is
    * `(pairs, groups)`; one maintained instance serves COUNT(DISTINCT),
    * MIN/MAX, and exact PERCENTILES over the join (wrap the shared
    * replay's L/R states and this pair into a [[State]] for the view
    * faces). */
  def maintainer(groupCol: String, valueCol: String)
      : MultiView.Maintainer[(DataFrame, DataFrame)] =
    new MultiView.Maintainer[(DataFrame, DataFrame)] {
      def empty(liveL0: DataFrame, liveR0: DataFrame, lPk: Seq[String],
                rPk: Seq[String], lJoinCols: Seq[String])
          : (DataFrame, DataFrame) = {
        val rows0 = liveL0.join(liveR0,
            lJoinCols.zip(rPk).map { case (l, r) => col(l) === col(r) }
              .reduce(_ && _))
          .select(col(groupCol).as("g"), col(valueCol).as("v"),
                  lit(1L).as("w"))
        (MultiView.emptyLike(
           rows0.groupBy(col("g"), col("v")).agg(sum(col("w")).as("net"))),
         MultiView.emptyLike(
           rows0.groupBy(col("g")).agg(sum(col("w")).as("n_rows"))))
      }
      def step(st: (DataFrame, DataFrame), ctx: MultiView.BatchCtx)
          : (DataFrame, DataFrame) =
        stepPairs(st._1, st._2, ctx, groupCol, valueCol)
      def pin(st: (DataFrame, DataFrame)): (DataFrame, DataFrame) =
        (st._1.localCheckpoint(false), st._2.localCheckpoint(false))
      def reRoot(st: (DataFrame, DataFrame),
                 to: org.apache.spark.sql.SparkSession)
          : (DataFrame, DataFrame) = {
        val b = org.apache.spark.sql.graft.bridge
        (b.reRoot(st._1, to), b.reRoot(st._2, to))
      }
    }

  /** Replay two event streams across `cuts` (JoinView.replay micro-batch
    * discipline: child session, AQE off, pinned logs, lazy per-batch
    * pins); returns the final state. */
  def replay(lEvents: DataFrame, rEvents: DataFrame, cuts: Seq[Long],
             lPk: Seq[String], rPk: Seq[String], lJoinCols: Seq[String],
             groupCol: String, valueCol: String,
             batchShufflePartitions: Int = 8,
             maxLocalKeys: Int = JoinView.DefaultMaxLocalKeys): State = {
    val parent = lEvents.sparkSession
    val child = parent.newSession()
    child.conf.set("spark.sql.adaptive.enabled", "false")
    child.conf.set("spark.sql.shuffle.partitions",
                   batchShufflePartitions.toString)
    def inChild(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.bridge.reRoot(df, child)
    def emptyLike(df: DataFrame): DataFrame =
      child.createDataFrame(
        child.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
    val lSchema = emptyLike(Materializer.compact(lEvents.limit(0), lPk))
    val rSchema = emptyLike(Materializer.compact(rEvents.limit(0), rPk))
    val joinCond = lJoinCols.zip(rPk)
      .map { case (l, r) => col(l) === col(r) }.reduce(_ && _)
    val rows0 = lSchema.drop(Materializer.MetaCols: _*)
      .join(rSchema.drop(Materializer.MetaCols: _*), joinCond)
      .select(col(groupCol).as("g"), col(valueCol).as("v"),
              lit(1L).as("w"))
    val emptyPairs = emptyLike(
      rows0.groupBy(col("g"), col("v")).agg(sum(col("w")).as("net")))
    val emptyGroups = emptyLike(
      rows0.groupBy(col("g")).agg(sum(col("w")).as("n_rows")))
    val lPinned = inChild(Materializer.pinnedEvents(lEvents))
      .coalesce(batchShufflePartitions)
    val rPinned = inChild(Materializer.pinnedEvents(rEvents))
      .coalesce(batchShufflePartitions)
    def slice(ev: DataFrame, lo: Long, hi: Long) =
      ev.filter(col("ts") > lo && col("ts") <= hi)
    val windows = (Long.MinValue +: cuts) :+ Long.MaxValue
    val bounds = windows.sliding(2).map { case Seq(lo, hi) => (lo, hi) }.toSeq
    // prefetch the NEXT window's changed-key collects off the per-batch
    // critical path (JoinView.replay rationale: a window's key sets
    // depend only on the PINNED logs, never on earlier batches)
    val prefetch = new Prefetch
    def keysFor(i: Int) = {
      val (lo, hi) = bounds(i)
      (prefetch.submit(
         JoinView.localKeys(slice(lPinned, lo, hi), lPk, maxLocalKeys)),
       prefetch.submit(
         JoinView.localKeys(slice(rPinned, lo, hi), rPk, maxLocalKeys)))
    }
    var pending = keysFor(0)
    val fin = try bounds.indices.foldLeft(
        State(lSchema, rSchema, emptyPairs, emptyGroups)) {
      case (st, i) =>
        val (lo, hi) = bounds(i)
        val (ckLF, ckRF) = pending
        if (i + 1 < bounds.size) pending = keysFor(i + 1)
        val next = applyBatch(st, slice(lPinned, lo, hi),
                              slice(rPinned, lo, hi),
                              lPk, rPk, lJoinCols, groupCol, valueCol,
                              keys = Some((prefetch.await(ckLF),
                                           prefetch.await(ckRF))),
                              maxLocalKeys = maxLocalKeys)
        next.copy(pairs = next.pairs.localCheckpoint(false),
                  groups = next.groups.localCheckpoint(false))
    } finally prefetch.shutdown()
    import org.apache.spark.sql.graft.bridge.reRoot
    State(reRoot(fin.left, parent), reRoot(fin.right, parent),
          reRoot(fin.pairs, parent), reRoot(fin.groups, parent))
  }
}
