package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained LEFT OUTER equi-join view `V = L ⟕ R` over
  * two changelogs — "ALL live orders, with the customer's name when the
  * customer is known, NULL otherwise". The inner-join maintainer
  * ([[JoinView]]) silently hides facts whose dimension hasn't arrived
  * (or was deleted); the outer view keeps them visible as NULL-padded
  * rows and RETRACTS the pad when the dimension shows up — the classic
  * outer-join IVM subtlety (a dim insert must delete the pad row AND
  * insert the joined one; a dim delete must do the reverse).
  *
  * Because `rPk` is R's primary key, every live L row owns EXACTLY ONE
  * view row (matched or padded), so the view is keyed by `lPk` and the
  * delta formula stays two-branch:
  * {{{
  *   touched = live(L')[pk ∈ keys(ΔL)]
  *           ∪ live(L')[pk ∉ keys(ΔL) ∧ fk ∈ keys(ΔR)]
  *   V' = V ∖ (pk ∈ keys(ΔL) ∨ fk ∈ keys(ΔR))  ∪  touched ⟕ live(R')
  * }}}
  *
  * Scale shape: same |Δ|-bounded contract as [[JoinView]] — but Spark
  * cannot BUILD-LEFT a left-outer hash join, so `touched ⟕ live(R')`
  * with a broadcast hint on the small side would force the FULL R state
  * into a broadcast. Instead the outer join is decomposed into
  * broadcast-safe pieces:
  * {{{
  *   matched = broadcast(touched) ⋈ live(R')      // inner, BuildLeft OK
  *   padded  = touched ∖ matched.keys             // anti vs |Δ|-bounded set
  *             × NULL R-columns
  * }}}
  * `matched` is |touched|-bounded, so the anti join's build side is small
  * too: neither state is ever exchanged or broadcast whole. Over-cap
  * batches drop the hints and degrade to distributed joins, exactly as
  * in [[JoinView]]. */
object LeftJoinView {

  /** Tombstone-aware L/R states + the current view rows. */
  final case class State(left: DataFrame, right: DataFrame, view: DataFrame)

  /** The canonical recompute the incremental path must equal: live(L) ⟕
    * live(R) projected to `viewCols` (R-side columns NULL when
    * unmatched). Also the schema seed for [[replay]]'s empty view. */
  def directView(liveL: DataFrame, liveR: DataFrame,
                 rPk: Seq[String], lJoinCols: Seq[String],
                 viewCols: Seq[String]): DataFrame = {
    val joinCond = lJoinCols.zip(rPk)
      .map { case (l, r) => col(l) === col(r) }.reduce(_ && _)
    liveL.join(liveR, joinCond, "left_outer")
      .select(viewCols.map(col): _*)
  }

  /** One micro-batch step. Same contract as [[JoinView.applyBatch]]:
    * `viewCols` must include `lPk` and `lJoinCols`; `dl`/`dr` must be
    * cheap to re-scan; `keys` optionally carries pre-collected key sets
    * (None side = over-cap, distributed fallback). */
  def applyBatch(st: State, dl: DataFrame, dr: DataFrame,
                 lPk: Seq[String], rPk: Seq[String], lJoinCols: Seq[String],
                 viewCols: Seq[String],
                 keys: Option[(Option[DataFrame], Option[DataFrame])] = None,
                 maxLocalKeys: Int = JoinView.DefaultMaxLocalKeys): State = {
    require(rPk.size == lJoinCols.size,
      s"lJoinCols (${lJoinCols.mkString(",")}) must match rPk " +
        s"(${rPk.mkString(",")}) positionally")
    require(lJoinCols.intersect(rPk).isEmpty,
      s"lJoinCols and rPk must not share column names " +
        s"(got ${lJoinCols.intersect(rPk).mkString(",")}); rename one side")
    val (ctx, lNext, rNext) = MultiView.batchCtx(st.left, st.right, dl, dr,
      lPk, rPk, lJoinCols, keys, maxLocalKeys)
    State(lNext, rNext, stepView(st.view, ctx, viewCols))
  }

  /** The view-specific half of a batch (shared verbatim between
    * [[applyBatch]] and the [[MultiView]] fan-out via [[maintainer]]). */
  private[cdc] def stepView(view: DataFrame, ctx: MultiView.BatchCtx,
                            viewCols: Seq[String]): DataFrame = {
    import ctx.{changedL, lLocal, rLocal, lPk, liveL, liveR, hinted}
    val bothLocal0 = lLocal && rLocal
    // FROM-EMPTY (bootstrap) fold: keep = ∅ and every live fact is
    // touched, so the view is matched(liveL ⋈ liveR) ∪ pad(the rest) —
    // the keep joins and changed-key restrictions drop out and the
    // changed-key pins are never scanned (bridge.staticallyEmpty
    // contract: plan-only).
    if (org.apache.spark.sql.graft.bridge.staticallyEmpty(view)) {
      val matched0 = ctx.fk.joinBoundedL(liveL, liveR, bothLocal0)
      val matchedKeys0 = matched0.select(lPk.map(col): _*)
      val pad0 = liveL.join(hinted(matchedKeys0, bothLocal0), lPk,
                            "left_anti")
      val lCols0 = liveL.columns.toSet
      val padProj0 = viewCols.map { c =>
        if (lCols0(c)) col(c)
        else lit(null).cast(liveR.schema(c).dataType).as(c)
      }
      return matched0.select(viewCols.map(col): _*)
        .unionByName(pad0.select(padProj0: _*))
    }
    // keep: view rows owned by untouched facts. A pad row carries its
    // fact's fk value in lJoinCols, so the anti join on changedR-as-fk
    // retracts the pad exactly when its dimension (finally) arrives.
    // fk-side joins ride ctx.fk/fkFilter: under-cap broadcast, over-cap
    // SALTED (MultiView.FkJoin — the AQE-off loop gets no skew-join help)
    val keep = ctx.fkFilter(
      view.join(hinted(changedL, lLocal), lPk, "left_anti"), "left_anti")
    // touched facts, both branches |Δ|-bounded. NOT pinned: the frame is
    // scanned twice (inner rebuild + pad anti join) but each scan is
    // broadcast-semi-pruned scan-side work over the already-pinned state
    // — duplicating it keeps the WHOLE rebuild visible to Catalyst in
    // one codegen-fusable plan (and plan-assertable, like JoinView's
    // rebuild branches), where a lazy checkpoint would opaque it behind
    // an RDD scan and add per-batch persist I/O.
    val touchedL = liveL.join(hinted(changedL, lLocal), lPk, "left_semi")
      .unionByName(ctx.fkFilter(
        liveL.join(hinted(changedL, lLocal), lPk, "left_anti"), "left_semi"))
    val bothLocal = lLocal && rLocal
    // inner piece: BuildLeft broadcast of the |Δ|-bounded fact side
    // (over-cap: fk-pruned + salted, see MultiView.FkJoin)
    val matched = ctx.fk.joinBoundedL(touchedL, liveR, bothLocal)
    // pad piece: touched facts with no live match. matched's key set is
    // |touched|-bounded, so IT is the anti join's build side — the R
    // state never rides a broadcast.
    val matchedKeys = matched.select(lPk.map(col): _*)
    val pad = touchedL.join(hinted(matchedKeys, bothLocal), lPk, "left_anti")
    // NULL-pad the R-side view columns, typed from the R state's schema
    val lCols = touchedL.columns.toSet
    val padProj = viewCols.map { c =>
      if (lCols(c)) col(c)
      else lit(null).cast(liveR.schema(c).dataType).as(c)
    }
    keep
      .select(viewCols.map(col): _*)
      .unionByName(matched.select(viewCols.map(col): _*))
      .unionByName(pad.select(padProj: _*))
  }

  /** This view as a [[MultiView.Maintainer]] — state is the view frame
    * alone (the L/R table states live in the shared replay). */
  def maintainer(viewCols: Seq[String]): MultiView.Maintainer[DataFrame] =
    new MultiView.Maintainer[DataFrame] {
      def empty(liveL0: DataFrame, liveR0: DataFrame, lPk: Seq[String],
                rPk: Seq[String], lJoinCols: Seq[String]): DataFrame =
        MultiView.emptyLike(
          directView(liveL0, liveR0, rPk, lJoinCols, viewCols))
      def step(view: DataFrame, ctx: MultiView.BatchCtx): DataFrame =
        stepView(view, ctx, viewCols)
      def pin(view: DataFrame): DataFrame = view.localCheckpoint(false)
      def reRoot(view: DataFrame, to: org.apache.spark.sql.SparkSession)
          : DataFrame = org.apache.spark.sql.graft.bridge.reRoot(view, to)
    }

  /** Replay two event streams across `cuts` ([[JoinView.replay]]'s
    * micro-batch discipline: child session, AQE off, batch-width
    * shuffles, pinned logs, prefetched key collects). */
  def replay(lEvents: DataFrame, rEvents: DataFrame, cuts: Seq[Long],
             lPk: Seq[String], rPk: Seq[String], lJoinCols: Seq[String],
             viewCols: Seq[String],
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
    val emptyView = emptyLike(directView(
      lSchema.drop(Materializer.MetaCols: _*),
      rSchema.drop(Materializer.MetaCols: _*),
      rPk, lJoinCols, viewCols))
    val lPinned = inChild(Materializer.pinnedEvents(lEvents))
      .coalesce(batchShufflePartitions)
    val rPinned = inChild(Materializer.pinnedEvents(rEvents))
      .coalesce(batchShufflePartitions)
    def slice(ev: DataFrame, lo: Long, hi: Long) =
      ev.filter(col("ts") > lo && col("ts") <= hi)
    val windows = (Long.MinValue +: cuts) :+ Long.MaxValue
    val bounds = windows.sliding(2).map { case Seq(lo, hi) => (lo, hi) }.toSeq
    val prefetch = new Prefetch
    def keysFor(i: Int) = {
      val (lo, hi) = bounds(i)
      (prefetch.submit(
         JoinView.localKeys(slice(lPinned, lo, hi), lPk, maxLocalKeys)),
       prefetch.submit(
         JoinView.localKeys(slice(rPinned, lo, hi), rPk, maxLocalKeys)))
    }
    var pending = keysFor(0)
    val fin = try bounds.indices
      .foldLeft(State(lSchema, rSchema, emptyView)) { case (st, i) =>
        val (lo, hi) = bounds(i)
        val (ckLF, ckRF) = pending
        if (i + 1 < bounds.size) pending = keysFor(i + 1)
        val next = applyBatch(st, slice(lPinned, lo, hi),
                              slice(rPinned, lo, hi),
                              lPk, rPk, lJoinCols, viewCols,
                              keys = Some((prefetch.await(ckLF),
                                           prefetch.await(ckRF))),
                              maxLocalKeys = maxLocalKeys)
        next.copy(view = next.view.localCheckpoint(false))
      } finally prefetch.shutdown()
    import org.apache.spark.sql.graft.bridge.reRoot
    State(reRoot(fin.left, parent), reRoot(fin.right, parent),
          reRoot(fin.view, parent))
  }
}
