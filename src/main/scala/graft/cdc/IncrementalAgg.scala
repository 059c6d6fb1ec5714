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
  *              handled.
  *
  * Partial-`before` handling (quirk Q3): Maxwell's `old` carries only
  * CHANGED columns. When the events carry `changed_cols` (key-presence
  * inspection of the raw `old` JSON — RowDecoder.changeEvents emits it),
  * the old value is taken from `before` EXACTLY when its key was present
  * in `old` (even if the old value was SQL NULL) and from `after`
  * otherwise — no ambiguity, nullable columns included. Events lacking
  * `changed_cols` fall back to coalesce-backfill, which cannot
  * distinguish "old value was SQL NULL" from "unchanged"; that fallback
  * is only sound when the grouped/aggregated columns are NOT NULL, so it
  * is rejected unless the caller passes `allowNullableFallback = true`.
  *
  * Scale shape: ONE pass over the decoded events (a single projection
  * producing 1-2 delta structs per event via inline explode), then a
  * map-side-partial SUM aggregation — shuffle bounded by |groups|, never
  * |events| or |base table|. This is what makes 100 TB-scale "revenue per
  * status, updated continuously" tractable: the base table is never read.
  *
  * Exactness: pass `valueCast` (e.g. `_.cast("decimal(25,10)")`) to make
  * sums order-independent and exactly equal to a recompute; raw double
  * sums accumulate in event order and can differ from a recompute in the
  * last ulps.
  */
object IncrementalAgg {

  /** The changelog-decoding scaffolding shared by every maintained
    * aggregate: validates the exactness contract, resolves Q3 partial
    * `before` images, and explodes each event into its ±1 delta structs
    * (built by `payload(group, value, sign)`). ONE copy, so a fix to the
    * Q3/Q4 discipline lands in every aggregate at once. */
  private def changeDeltas(events: DataFrame, fn: String,
                           groupCol: String, valueCol: String,
                           allowNullableFallback: Boolean)
                          (payload: (Column, Column, Int) => Column)
      : DataFrame = {
    val hasChangedCols = events.columns.contains("changed_cols")
    require(hasChangedCols || allowNullableFallback,
      s"$fn: events carry no `changed_cols` column; the coalesce " +
        "backfill for partial `before` images misattributes retract " +
        "deltas when the grouped/aggregated columns are nullable. Decode " +
        "with RowDecoder.changeEvents (which emits changed_cols), or opt " +
        "in with allowNullableFallback = true for NOT NULL columns.")
    def after(c: String): Column = col(s"after.$c")
    def before(c: String): Column =
      if (hasChangedCols)
        // An update whose raw `old` was NULL or malformed JSON decodes to
        // NULL changed_cols (json_object_keys returns NULL) — on the
        // exact path that must FAIL, not silently evaluate as "no column
        // changed" (before := after, a wrong retraction). raise_error is
        // inside the update-only CASE branch, so it fires only for rows
        // that actually take it.
        when(col("changed_cols").isNull,
             raise_error(concat(
               lit(s"IncrementalAgg.$fn: update event with NULL " +
                   "changed_cols (raw `old` missing or malformed JSON) — " +
                   "exact retraction impossible; event ts="),
               col("ts").cast("string"))))
          // Q3, exact: key present in raw `old` -> old value (even NULL)
          .when(array_contains(col("changed_cols"), c), col(s"before.$c"))
          .otherwise(col(s"after.$c"))
      else coalesce(col(s"before.$c"), col(s"after.$c")) // NOT NULL only
    // unknown op types (Maxwell bootstrap-* rows etc.) carry no delta —
    // drop them rather than letting them fall into the update branch
    events.filter(col("op").isin("insert", "delete", "update"))
      .select(explode(
        when(col("op") === "insert",
          array(payload(after(groupCol), after(valueCol), 1)))
        .when(col("op") === "delete",
          array(payload(after(groupCol), after(valueCol), -1)))
        .otherwise( // update: retract old, apply new
          array(payload(before(groupCol), before(valueCol), -1),
                payload(after(groupCol), after(valueCol), 1)))).as("d"))
      .select(col("d.*"))
  }

  /** SUM(valueCol) + COUNT(*) per groupCol, from change events alone. */
  def sumCount(events: DataFrame, groupCol: String, valueCol: String,
               prune: Boolean = true,
               valueCast: Column => Column = identity,
               allowNullableFallback: Boolean = false): DataFrame = {
    val deltas = changeDeltas(events, "sumCount", groupCol, valueCol,
        allowNullableFallback) { (g, v, sign) =>
      struct(g.as("g"), (valueCast(v) * sign).as("dv"),
             lit(sign.toLong).as("dc"))
    }
    val agg = deltas
      .groupBy(col("g").as(groupCol))
      .agg(sum(col("dv")).as(s"sum_$valueCol"), sum(col("dc")).as("n_rows"))
    if (prune) agg.filter(col("n_rows") > 0) else agg
  }

  /** First two MOMENTS per group — SUM, SUM of squares, COUNT — from
    * change events alone; AVG/VARIANCE/STDDEV are scalar functions of
    * these, so "running average order value per status" (and its spread)
    * maintains with the same ±delta algebra as [[sumCount]]: moments are
    * SUBTRACTABLE, no pair state needed. Cast to decimal via `valueCast`
    * for order-independent exactness (the square is computed in decimal
    * too — cast before multiplying, so precision 38 bounds apply to the
    * cast type, not the square). */
  def moments(events: DataFrame, groupCol: String, valueCol: String,
              prune: Boolean = true,
              valueCast: Column => Column = identity,
              allowNullableFallback: Boolean = false): DataFrame = {
    val deltas = changeDeltas(events, "moments", groupCol, valueCol,
        allowNullableFallback) { (g, v, sign) =>
      val cv = valueCast(v)
      struct(g.as("g"), (cv * sign).as("dv"),
             (cv * cv * sign).as("dv2"), lit(sign.toLong).as("dc"))
    }
    val agg = deltas
      .groupBy(col("g").as(groupCol))
      .agg(sum(col("dv")).as(s"sum_$valueCol"),
           sum(col("dv2")).as(s"sumsq_$valueCol"),
           sum(col("dc")).as("n_rows"))
    if (prune) agg.filter(col("n_rows") > 0) else agg
  }

  /** COUNT(DISTINCT valueCol) per groupCol, maintained from change events
    * alone — the aggregate plain sketches cannot maintain under deletes
    * (HLL is not subtractable). The classical exact plan: keep net
    * multiplicities per (group, value) pair, count the pairs with net
    * multiplicity > 0. Events contribute ±1 pair deltas exactly like
    * [[sumCount]] (same Q3/Q4 partial-`before` discipline). NULL values
    * form no pair (SQL's count-distinct ignores NULLs), but a group whose
    * live rows are ALL null-valued still reports 0 — matching
    * `COUNT(DISTINCT v) ... GROUP BY g` over the live state exactly, so
    * the row-count delta rides along to keep live groups visible.
    *
    * Scale shape: ONE shuffle on (group, value) with map-side partial
    * sums — bounded by the live pair cardinality, never |events| — then a
    * |groups|-bounded recount joined to the |groups|-bounded liveness
    * roll-up. At 100 TB the pair table is the persisted incremental
    * state; each batch touches only its delta's pairs. */
  def distinctCount(events: DataFrame, groupCol: String, valueCol: String,
                    allowNullableFallback: Boolean = false): DataFrame = {
    val (pairs, groups) = pairMultiplicities(events, "distinctCount",
      groupCol, valueCol, allowNullableFallback)
    pairStateView(pairs, groups, groupCol, valueCol)
  }

  /** The ±1 (group, value) pair deltas rolled up to net multiplicities:
    * (`pairs` = (g, v, net) over non-null values, `groups` = (g, n_rows)
    * over ALL deltas — null-valued rows count toward group liveness but
    * form no pair). This is THE maintainable state for every
    * non-subtractable aggregate over a changelog: count-distinct counts
    * the net>0 pairs, min/max scan them — and both [[distinctCountBatch]]
    * and a full-log fold produce it with the same code path.
    *
    * ONE shuffle over the deltas: `groups` is derived by re-aggregating
    * the (g, v) partial sums — |live pairs| rows, a fraction of |deltas|
    * — instead of a second full-width shuffle of the deltas on g. NULL
    * values form their own (g, NULL) row in the pre-aggregate, so the g
    * roll-up still counts every row; the pair face filters them out. In
    * the one-shot (single-job) views the two consumers share the (g, v)
    * exchange via Spark's ReusedExchange; batch callers pass `pin` to
    * localCheckpoint the pre-aggregate instead, since their consumers
    * run as separate jobs (key collects) where exchange reuse can't
    * reach. */
  private def pairMultiplicities(events: DataFrame, fn: String,
                                 groupCol: String, valueCol: String,
                                 allowNullableFallback: Boolean,
                                 pin: Boolean = false)
      : (DataFrame, DataFrame) = {
    val deltas = changeDeltas(events, fn, groupCol, valueCol,
        allowNullableFallback) { (g, v, sign) =>
      struct(g.as("g"), v.as("v"), lit(sign.toLong).as("dc"))
    }
    val all0 = deltas.groupBy(col("g"), col("v"))
      .agg(sum(col("dc")).as("net"))
    val all = if (pin) all0.localCheckpoint(false) else all0
    val pairs = all.filter(col("v").isNotNull)
    val groups = all.groupBy(col("g"))
      .agg(sum(col("net")).as("n_rows"))
    (pairs, groups)
  }

  /** COUNT(DISTINCT) view over pair-multiplicity state (see
    * [[pairMultiplicities]]): count the net>0 pairs per group, keep live
    * groups whose values are all NULL visible with count 0. */
  private def pairStateView(pairs: DataFrame, groups: DataFrame,
                            groupCol: String, valueCol: String): DataFrame = {
    val counted = pairs.filter(col("net") > 0)
      .groupBy(col("g")).agg(count(lit(1)).as("n_distinct"))
    // null-safe group join: NULL is a legitimate GROUP BY group, and a
    // null-unsafe join would zero its count even when it has live values
    groups.filter(col("n_rows") > 0).alias("__lg")
      .join(counted.alias("__p"), col("__lg.g") <=> col("__p.g"), "left")
      .select(col("__lg.g").as(groupCol),
              coalesce(col("n_distinct"), lit(0L))
                .as(s"n_distinct_$valueCol"))
  }

  /** MIN/MAX(valueCol) per groupCol, maintained from change events alone
    * — min/max are non-subtractable exactly like count-distinct (a
    * delete of the current max cannot be undone from the aggregate
    * value; the classic reason CDC handlers re-query the base table,
    * `/root/reference/cdc_manager.go:277-298`). Same cure: the
    * [[pairMultiplicities]] state already holds every LIVE value per
    * group, so min/max are a scan of the net>0 pairs — a delete of the
    * max drops its pair and the runner-up is simply the new group max.
    * A live group whose values are all NULL reports NULL min/max
    * (matching `MIN(v) ... GROUP BY g` over the live state exactly).
    *
    * Scale shape: identical to [[distinctCount]] — one (group, value)
    * shuffle with map-side partials, |groups|-bounded min/max rollup. */
  def minMax(events: DataFrame, groupCol: String, valueCol: String,
             allowNullableFallback: Boolean = false): DataFrame = {
    val (pairs, groups) = pairMultiplicities(events, "minMax",
      groupCol, valueCol, allowNullableFallback)
    minMaxView(DistinctState(pairs, groups), groupCol, valueCol)
  }

  /** Persisted pair-multiplicity state for the streaming COUNT(DISTINCT)
    * face: the net-(group, value) pair table plus the group row-count
    * roll-up. Rows with net/n_rows = 0 are dropped (state-size bound);
    * NEGATIVE nets are retained — a delete arriving in an earlier batch
    * than its insert (cross-batch out-of-order) must cancel, not count. */
  final case class DistinctState(pairs: DataFrame, groups: DataFrame)

  /** One micro-batch step for the maintained COUNT(DISTINCT) view: fold
    * the batch's ±1 pair deltas into the persisted [[DistinctState]].
    * Addition is commutative, so the merged state is arrival-order
    * independent across any batching of the same events.
    *
    * Delta-restricted: state rows whose (g, v) key the batch never
    * touched pass through an anti join UNCHANGED — the only aggregation
    * is over the |Δ|-bounded touched set, mirroring Materializer.merge.
    * Under `maxLocalKeys` touched keys ride a driver-local broadcast
    * LocalRelation (no per-batch build job); above it the joins run
    * unhinted cluster-side (JoinView.localKeys discipline). */
  def distinctCountBatch(st: DistinctState, events: DataFrame,
                         groupCol: String, valueCol: String,
                         allowNullableFallback: Boolean = false,
                         maxLocalKeys: Int = JoinView.DefaultMaxLocalKeys)
      : DistinctState = {
    val (dPairs, dGroups) = pairMultiplicities(events, "distinctCountBatch",
      groupCol, valueCol, allowNullableFallback, pin = true)
    DistinctState(
      mergeAdditive(st.pairs, dPairs, Seq("g", "v"), Seq("net"), maxLocalKeys),
      mergeAdditive(st.groups, dGroups, Seq("g"), Seq("n_rows"), maxLocalKeys))
  }

  /** One micro-batch step for the maintained MOMENTS (avg/variance) view:
    * fold the batch's ±(value, value², 1) deltas into the persisted
    * per-group moment sums. Moments are SUBTRACTABLE, so the state IS the
    * aggregate — (groupCol, sum_<v>, sumsq_<v>, n_rows), one row per
    * group, no pair table. Addition is commutative, so the merged state
    * is arrival-order independent across any batching of the same events;
    * groups whose every counter nets to zero are dropped (state-size
    * bound), while negative/partial counters are retained so a delete
    * arriving in an earlier batch than its insert cancels exactly.
    *
    * Same delta-restricted shape as [[distinctCountBatch]]: untouched
    * groups pass through an anti join unchanged; only the |Δ|-bounded
    * touched set re-aggregates. Pass the SAME `valueCast` on every batch
    * (it is part of the state's type contract — decimal casts make the
    * fold exact and order-independent). */
  def momentsBatch(state: DataFrame, events: DataFrame,
                   groupCol: String, valueCol: String,
                   valueCast: Column => Column = identity,
                   allowNullableFallback: Boolean = false,
                   maxLocalKeys: Int = JoinView.DefaultMaxLocalKeys)
      : DataFrame = {
    val deltas = moments(events, groupCol, valueCol, prune = false,
      valueCast, allowNullableFallback)
    mergeAdditive(state, deltas, Seq(groupCol),
      Seq(s"sum_$valueCol", s"sumsq_$valueCol", "n_rows"), maxLocalKeys)
  }

  /** The live view over a maintained [[momentsBatch]] state: groups with
    * live rows only — same schema and semantics as the one-shot
    * [[moments]] with `prune = true` (AVG/VARIANCE/STDDEV are scalar
    * functions of these columns, computed by the reader). */
  def momentsView(state: DataFrame): DataFrame =
    state.filter(col("n_rows") > 0)

  /** Empty moments state with the right column types for the
    * group/value/cast combination, derived from (but never scanning) the
    * event stream. */
  def emptyMomentsState(events: DataFrame, groupCol: String,
                        valueCol: String,
                        valueCast: Column => Column = identity): DataFrame = {
    val spark = events.sparkSession
    val m = moments(events.limit(0), groupCol, valueCol, prune = false,
      valueCast, allowNullableFallback = true)
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
  }

  /** The pair-multiplicity family as a [[TableViews.Maintainer]] — one
    * maintained [[DistinctState]] serves COUNT(DISTINCT), MIN/MAX, and
    * exact PERCENTILES off the shared single-topic replay. */
  def distinctMaintainer(groupCol: String, valueCol: String,
                         allowNullableFallback: Boolean = false)
      : TableViews.Maintainer[DistinctState] =
    new TableViews.Maintainer[DistinctState] {
      def empty(events0: DataFrame, pk: Seq[String]): DistinctState =
        emptyDistinctState(events0, groupCol, valueCol)
      def step(st: DistinctState, ctx: TableViews.BatchCtx): DistinctState =
        distinctCountBatch(st, ctx.delta, groupCol, valueCol,
          allowNullableFallback, ctx.maxLocalKeys)
      def pin(st: DistinctState): DistinctState =
        DistinctState(st.pairs.localCheckpoint(false),
                      st.groups.localCheckpoint(false))
      def reRoot(st: DistinctState,
                 to: org.apache.spark.sql.SparkSession): DistinctState = {
        val b = org.apache.spark.sql.graft.bridge
        DistinctState(b.reRoot(st.pairs, to), b.reRoot(st.groups, to))
      }
    }

  /** The subtractable moments family as a [[TableViews.Maintainer]] —
    * the per-group (sum, sum², n) state behind AVG/VARIANCE/STDDEV. Pass
    * the SAME `valueCast` every round (part of the state's type
    * contract). */
  def momentsMaintainer(groupCol: String, valueCol: String,
                        valueCast: Column => Column = identity,
                        allowNullableFallback: Boolean = false)
      : TableViews.Maintainer[DataFrame] =
    new TableViews.Maintainer[DataFrame] {
      def empty(events0: DataFrame, pk: Seq[String]): DataFrame =
        emptyMomentsState(events0, groupCol, valueCol, valueCast)
      def step(st: DataFrame, ctx: TableViews.BatchCtx): DataFrame =
        momentsBatch(st, ctx.delta, groupCol, valueCol, valueCast,
          allowNullableFallback, ctx.maxLocalKeys)
      def pin(st: DataFrame): DataFrame = st.localCheckpoint(false)
      def reRoot(st: DataFrame,
                 to: org.apache.spark.sql.SparkSession): DataFrame =
        org.apache.spark.sql.graft.bridge.reRoot(st, to)
    }

  /** The COUNT(DISTINCT) view over a maintained [[DistinctState]] —
    * (groupCol, n_distinct_<valueCol>), same schema and semantics as the
    * one-shot [[distinctCount]]. */
  def distinctCountView(st: DistinctState, groupCol: String,
                        valueCol: String): DataFrame =
    pairStateView(st.pairs, st.groups, groupCol, valueCol)

  /** The MIN/MAX view over the SAME maintained [[DistinctState]] — one
    * persisted pair table serves the whole non-subtractable family;
    * schema and semantics match the one-shot [[minMax]]. */
  def minMaxView(st: DistinctState, groupCol: String,
                 valueCol: String): DataFrame = {
    val bounds = st.pairs.filter(col("net") > 0)
      .groupBy(col("g"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    st.groups.filter(col("n_rows") > 0).alias("__lg")
      .join(bounds.alias("__p"), col("__lg.g") <=> col("__p.g"), "left")
      .select(col("__lg.g").as(groupCol),
              col("mn").as(s"min_$valueCol"),
              col("mx").as(s"max_$valueCol"))
  }

  /** Exact discrete PERCENTILES per group, maintained over the SAME
    * [[DistinctState]] pair table as count-distinct and min/max —
    * percentiles are the textbook non-subtractable aggregate (a delete of
    * the current median shifts it to a neighbor no sketch can recover:
    * KLL — `q_quantile_sketch` — is insertion-only), and the net
    * pair-multiplicity state is exactly the compressed live value
    * distribution they need.
    *
    * Definition (matches DuckDB's `quantile_disc` and Spark's exact
    * lower discrete quantile): per group, the p-quantile is the smallest
    * live value whose cumulative live-row count reaches
    * `max(1, ceil(p * n))`, NULLs excluded from n; a live group whose
    * values are all NULL reports NULL (matching `quantile_disc(v)` over
    * the live state). Both engines evaluate `p * n` in IEEE double, so
    * the rank index agrees bit-for-bit.
    *
    * Scale shape: ONE g-partitioned window pass over the live pairs —
    * shuffle and sort are bounded by the live (group, value) pair
    * cardinality (the state's own size), never by |rows| or |events|:
    * multiplicities are summed, not exploded. All requested percentiles
    * ride the same pass as conditional-min aggregates. */
  def percentileView(st: DistinctState, groupCol: String, valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentileView: percentiles must be in (0, 1], got $ps")
    import org.apache.spark.sql.expressions.Window
    val live = st.pairs.filter(col("net") > 0)
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same partitioning as wCum -> one exchange serves both frames
    val wAll = Window.partitionBy(col("g"))
    val cum = live.withColumn("__cum", sum(col("net")).over(wCum))
      .withColumn("__n", sum(col("net")).over(wAll))
    val aggs = ps.map { p =>
      val pos = greatest(lit(1L), ceil(lit(p) * col("__n")).cast("long"))
      min(when(col("__cum") >= pos, col("v"))).as(pctName(p, valueCol))
    }
    val qs = cum.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
    // null-safe liveness join, like minMaxView: NULL is a legitimate
    // group, and all-NULL-valued live groups must stay visible
    st.groups.filter(col("n_rows") > 0).alias("__lg")
      .join(qs.alias("__q"), col("__lg.g") <=> col("__q.g"), "left")
      .select(col("__lg.g").as(groupCol) +:
              ps.map(p => col(pctName(p, valueCol))): _*)
  }

  /** One-shot exact percentiles from change events alone (the replay
    * face of [[percentileView]] — same Q3/Q4 discipline as the rest of
    * the pair-state family). */
  def percentiles(events: DataFrame, groupCol: String, valueCol: String,
                  ps: Seq[Double],
                  allowNullableFallback: Boolean = false): DataFrame = {
    val (pairs, groups) = pairMultiplicities(events, "percentiles",
      groupCol, valueCol, allowNullableFallback)
    percentileView(DistinctState(pairs, groups), groupCol, valueCol, ps)
  }

  /** `0.25 -> p25_<col>`; non-integral percents keep their digits with
    * the dot swapped for `_` (`0.999 -> p99_9_<col>`). */
  private def pctName(p: Double, valueCol: String): String = {
    val pct = p * 100
    val label = if (pct == math.floor(pct)) pct.toInt.toString
                else pct.toString.replace('.', '_')
    s"p${label}_$valueCol"
  }

  /** Empty [[DistinctState]] with the right schemas for the group/value
    * column types, derived from (but never scanning) the event stream. */
  def emptyDistinctState(events: DataFrame, groupCol: String,
                         valueCol: String): DistinctState = {
    val spark = events.sparkSession
    def emptyLike(df: DataFrame): DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
    val (p, g) = pairMultiplicities(events.limit(0), "emptyDistinctState",
      // schema derivation only — the nullable-fallback contract is
      // checked (and enforced) on the real batches, not the empty probe
      groupCol, valueCol, allowNullableFallback = true)
    DistinctState(emptyLike(p), emptyLike(g))
  }

  /** Additive counter merge: `state' = state[∉ keys(Δ)] ∪
    * Σ(state[keys(Δ)] ∪ Δ)`, dropping rows whose every counter nets to
    * zero. Key joins are null-safe (NULL group is legitimate); the
    * touched-key set is collected and broadcast only under `cap`
    * (JoinView.localKeys discipline — an AvailableNow backlog batch must
    * not collect an unbounded key set onto the driver). */
  private[cdc] def mergeAdditive(state: DataFrame, deltas: DataFrame,
                                 keys: Seq[String], counters: Seq[String],
                                 cap: Int): DataFrame = {
    // FROM-EMPTY (bootstrap) fold: state' = Σ Δ. Against a statically
    // empty state the touched-key collect below (a full distinct over
    // the delta aggregate's lineage, one driver job per fold) and the
    // anti/semi patch joins are pure overhead — on a one-shot bootstrap
    // batch they were the dominant per-maintainer cost (measured: the
    // x15 mergeAdditive collects in the documents family's
    // StateBuildProbe). Identical semantics and column order (the
    // general path's unionByName aligns to the state's columns); only
    // the plan changes.
    if (org.apache.spark.sql.graft.bridge.staticallyEmpty(state)) {
      val aggs = counters.map(c => sum(col(c)).as(c))
      return deltas.groupBy(keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .filter(counters.map(c => col(c) =!= 0).reduce(_ || _))
        .select(state.columns.toSeq.map(col): _*)
    }
    val sel = deltas.select(keys.map(col): _*).distinct()
    val localCk = {
      val rows = sel.limit(cap + 1).collect().toSeq
      if (rows.size > cap) None
      else Some(state.sparkSession.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, sel.schema))
    }
    val ck = localCk.getOrElse(sel.localCheckpoint(false)).alias("__ck")
    def hinted(df: DataFrame): DataFrame =
      if (localCk.isDefined) broadcast(df) else df
    val st = state.alias("__st")
    val keyCond = keys.map(k => col(s"__st.$k") <=> col(s"__ck.$k"))
      .reduce(_ && _)
    val untouched = st.join(hinted(ck), keyCond, "left_anti")
    val touched = st.join(hinted(ck), keyCond, "left_semi")
    val aggs = counters.map(c => sum(col(c)).as(c))
    val merged = touched.unionByName(deltas)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      // keep a row while ANY counter is non-zero (a NULL sum — all-NULL
      // values — contributes neither way; all-zero-or-NULL rows drop)
      .filter(counters.map(c => col(c) =!= 0).reduce(_ || _))
    untouched.unionByName(merged)
  }
}
