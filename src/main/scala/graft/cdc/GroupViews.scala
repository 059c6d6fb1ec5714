package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic DELTA-RESTRICTED PER-GROUP view maintenance — the machinery
  * behind the maintained SEQUENTIAL-PATTERN views (sessions, funnel,
  * transitions), where the per-group result is an arbitrary computation
  * (windows, chained joins) that no per-row algebra maintains, but whose
  * groups are independent: a batch can only change the output rows of
  * the groups it touched.
  *
  * [[grouped]] keeps a view frame `perGroup(live)` current by
  * recomputing ONLY the touched groups against the post-merge live
  * state ([[IncrementalTopK.stepView]]'s re-rank discipline generalized
  * to any per-group function). [[groupedWithRollup]] additionally
  * maintains a small ADDITIVE rollup of the view rows (funnel counts,
  * transition-pair totals) from the touched groups' before/after rows
  * alone — serving the rollup is O(1), never a scan of the per-group
  * view.
  *
  * Scale shape, per batch: one changed-group collect (capped, distributed
  * fallback above `maxLocalKeys`), one anti + one semi join against the
  * pinned view (broadcast when the touched set is driver-local), and
  * `perGroup` over ONLY the touched groups' live rows — cost is bounded
  * by the touched groups' history, never the corpus. The reference has
  * no view maintenance at all (it is a Kafka consumer,
  * `/root/reference/cdc_manager.go:277-298`); these views are what its
  * handler fan-out shape becomes when the handlers maintain state. */
object GroupViews {

  /** Null-safe group semi/anti join (Materializer.merge's key-join
    * discipline): a NULL group must match itself, or rows with a NULL
    * group would sit in the view forever un-recomputed. Broadcast only
    * when the touched set is a driver-local under-cap relation. */
  private def byGroup(left: DataFrame, tg: DataFrame, tgLocal: Boolean,
                      groupCol: String, how: String): DataFrame = {
    val tgA = tg.alias("__tg")
    left.alias("__l").join(if (tgLocal) broadcast(tgA) else tgA,
      col(s"__l.$groupCol") <=> col(s"__tg.$groupCol"), how)
  }

  private def emptyLike(spark: SparkSession,
                        schema: org.apache.spark.sql.types.StructType)
      : DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  private def emptyLive(events0: DataFrame, pk: Seq[String]): DataFrame = {
    val spark = events0.sparkSession
    emptyLike(spark, Materializer.compact(events0, pk)
      .drop(Materializer.MetaCols: _*).schema)
  }

  /** A view `perGroup(liveState)` maintained by touched-group recompute.
    * `perGroup` must be group-local: its output rows for a group depend
    * only on that group's live rows (windows partitioned by `groupCol`,
    * joins/aggregates keyed by it). */
  def grouped(groupCol: String)(perGroup: DataFrame => DataFrame)
      : TableViews.Maintainer[DataFrame] =
    new TableViews.Maintainer[DataFrame] {
      def empty(events0: DataFrame, pk: Seq[String]): DataFrame = {
        val live0 = emptyLive(events0, pk)
        emptyLike(events0.sparkSession, perGroup(live0).schema)
      }
      def step(view: DataFrame, ctx: TableViews.BatchCtx): DataFrame = {
        // FROM-EMPTY (bootstrap) fold: every live group came from this
        // batch — the view is perGroup over the whole post-merge live
        // state; the touched-group collect and the anti/semi pair are
        // pure overhead (bridge.staticallyEmpty contract: plan-only)
        if (org.apache.spark.sql.graft.bridge.staticallyEmpty(view))
          return perGroup(Materializer.liveView(ctx.postState))
        val (tg, tgLocal) = IncrementalTopK.touchedGroups(
          ctx.delta, groupCol, ctx.maxLocalKeys)
        val untouched = byGroup(view, tg, tgLocal, groupCol, "left_anti")
        val recomputed = perGroup(byGroup(
          Materializer.liveView(ctx.postState), tg, tgLocal, groupCol,
          "left_semi"))
        untouched.unionByName(recomputed)
      }
      def pin(view: DataFrame): DataFrame = view.localCheckpoint(false)
      def reRoot(view: DataFrame, to: SparkSession): DataFrame =
        org.apache.spark.sql.graft.bridge.reRoot(view, to)
    }

  /** Per-group view rows + an additively-maintained rollup of them. */
  final case class RollupState(rows: DataFrame, totals: DataFrame)

  /** [[grouped]] plus a maintained additive rollup: `rollup(viewRows)`
    * must aggregate to `rollupKeys` + NUMERIC measure columns of
    * EXACTLY-ADDITIVE type (integral or decimal — float sums drift under
    * retraction, same contract as IncrementalAgg's decimal-cast sums).
    * Per batch the totals fold `rollup(newRows) − rollup(oldRows)` over
    * the touched groups only; keys whose measures all net to zero are
    * retracted from the totals (TokenFreqView's liveness discipline). */
  def groupedWithRollup(groupCol: String, rollupKeys: Seq[String])
                       (perGroup: DataFrame => DataFrame)
                       (rollup: DataFrame => DataFrame)
      : TableViews.Maintainer[RollupState] =
    new TableViews.Maintainer[RollupState] {
      private def measures(totals: DataFrame): Seq[String] = {
        val ms = totals.columns.toSeq.filterNot(rollupKeys.contains)
        require(ms.nonEmpty, "rollup must carry at least one measure")
        totals.schema.fields.filter(f => ms.contains(f.name)).foreach { f =>
          f.dataType match {
            case org.apache.spark.sql.types.ByteType |
                 org.apache.spark.sql.types.ShortType |
                 org.apache.spark.sql.types.IntegerType |
                 org.apache.spark.sql.types.LongType |
                 (_: org.apache.spark.sql.types.DecimalType) => ()
            case dt => throw new IllegalArgumentException(
              s"groupedWithRollup: measure '${f.name}' has non-additive " +
                s"type $dt — cast to integral or decimal so retraction " +
                "is exact")
          }
        }
        ms
      }
      private def fold(totals: DataFrame, pos: DataFrame, neg: DataFrame)
          : DataFrame = {
        val ms = measures(totals)
        val negated = neg.select(
          rollupKeys.map(col) ++
            ms.map(m => (col(m) * lit(-1)).cast(
              totals.schema(m).dataType).as(m)): _*)
        // sums COALESCED to 0: a NULL measure contributes nothing on
        // insert and nothing on retract (sum skips NULL rows, and the
        // negated branch's NULL * -1 is NULL), but an all-NULL key must
        // fold to 0 — not NULL, which would null-propagate through the
        // liveness filter below and silently drop the key from the
        // totals even while live
        def zero(m: String) = lit(0).cast(totals.schema(m).dataType)
        totals.unionByName(pos).unionByName(negated)
          .groupBy(rollupKeys.map(col): _*)
          .agg(ms.map(m => coalesce(sum(col(m)), zero(m)).cast(
                 totals.schema(m).dataType).as(m)).head,
               ms.tail.map(m => coalesce(sum(col(m)), zero(m)).cast(
                 totals.schema(m).dataType).as(m)): _*)
          .filter(ms.map(m => col(m) =!= 0).reduce(_ || _))
      }
      def empty(events0: DataFrame, pk: Seq[String]): RollupState = {
        val live0 = emptyLive(events0, pk)
        val rows0 = emptyLike(events0.sparkSession, perGroup(live0).schema)
        val totals0 = emptyLike(events0.sparkSession, rollup(rows0).schema)
        measures(totals0) // validate the additive-type contract up front
        RollupState(rows0, totals0)
      }
      def step(st: RollupState, ctx: TableViews.BatchCtx): RollupState = {
        // FROM-EMPTY (bootstrap) fold: no prior rows/totals — the view
        // is perGroup over the whole live state, the totals fold is the
        // fresh rows' rollup alone (same fold, empty retraction side);
        // the touched-group collect and the three group joins are pure
        // overhead (bridge.staticallyEmpty contract: plan-only)
        if (org.apache.spark.sql.graft.bridge.staticallyEmpty(st.rows) &&
            org.apache.spark.sql.graft.bridge.staticallyEmpty(st.totals)) {
          val newPart = perGroup(Materializer.liveView(ctx.postState))
            .localCheckpoint(false)
          return RollupState(newPart,
            fold(st.totals, rollup(newPart), rollup(emptyLike(
              ctx.delta.sparkSession, newPart.schema))))
        }
        val (tg, tgLocal) = IncrementalTopK.touchedGroups(
          ctx.delta, groupCol, ctx.maxLocalKeys)
        val oldPart = byGroup(st.rows, tg, tgLocal, groupCol, "left_semi")
        // PINNED: the per-group recompute (the window/join-heavy part)
        // feeds BOTH the rows frame and the totals fold, which pin() as
        // two separate plans — without this, perGroup would run twice
        // per batch
        val newPart = perGroup(byGroup(
            Materializer.liveView(ctx.postState), tg, tgLocal, groupCol,
            "left_semi"))
          .localCheckpoint(false)
        RollupState(
          byGroup(st.rows, tg, tgLocal, groupCol, "left_anti")
            .unionByName(newPart),
          fold(st.totals, rollup(newPart), rollup(oldPart)))
      }
      def pin(st: RollupState): RollupState =
        RollupState(st.rows.localCheckpoint(false),
                    st.totals.localCheckpoint(false))
      def reRoot(st: RollupState, to: SparkSession): RollupState = {
        val b = org.apache.spark.sql.graft.bridge
        RollupState(b.reRoot(st.rows, to), b.reRoot(st.totals, to))
      }
    }
}

/** The sequential-pattern operators as [[GroupViews]] per-group
  * functions over a live events frame `(event_id, ts_us, user_id,
  * event_type, value)` — the same formulations as the batch queries
  * (`FunctionQueries.q_sessionize` / `q_event_funnel` /
  * `q_event_transitions`), restricted per batch to the touched users. */
object SequentialViews {

  /** 30-min-gap sessionization summary: one row per (user, session). */
  def sessionSummary(gapUs: Long)(live: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val newSess = when(
      lag(col("ts_us"), 1).over(w).isNull ||
        col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs,
      1).otherwise(0)
    live
      .withColumn("sess_id",
        sum(newSess).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id").cast("int").as("sess_id"))
      .agg(count(lit(1)).as("n_events"),
           timestamp_micros(min(col("ts_us"))).as("sess_start"),
           round((max(col("ts_us")) - min(col("ts_us"))) / 1000000.0, 3)
             .as("dur_sec"))
  }

  def sessionMaintainer(gapUs: Long = 1800L * 1000000L)
      : TableViews.Maintainer[DataFrame] =
    GroupViews.grouped("user_id")(sessionSummary(gapUs))

  /** Strictly-ordered funnel stage times per user: `t1..tn` where `tI`
    * is the user's first `steps(I-1)` event AFTER `t(I-1)`. Chained
    * join+aggregate, every stage keyed on user_id (one partitioning
    * planned for the whole chain — q_event_funnel's shape). Only users
    * who reached stage 1 have a row. */
  def funnelStages(steps: Seq[String])(live: DataFrame): DataFrame = {
    require(steps.nonEmpty, "funnelStages: at least one step")
    val ev = live.select(col("user_id"), col("event_type"), col("ts_us"))
    var acc = ev.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    var i = 2
    steps.tail.foreach { name =>
      val prev = (1 until i).map(j => s"t$j")
      val cur = ev.filter(col("event_type") === name)
        .select(col("user_id"), col("ts_us").as("__us"))
      acc = acc.join(cur, Seq("user_id"), "left")
        .groupBy(col("user_id") +: prev.map(col): _*)
        .agg(min(when(col("__us") > col(s"t${i - 1}"), col("__us")))
          .as(s"t$i"))
      i += 1
    }
    acc
  }

  /** Funnel rollup: per (stage, step) the count of users whose stage
    * time is set — one explode pass over the stage rows. */
  def funnelRollup(steps: Seq[String])(stages: DataFrame): DataFrame =
    stages.select(explode(array(steps.zipWithIndex.map { case (name, i) =>
        struct(lit(i + 1).as("stage"), lit(name).as("step"),
               when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)
                 .as("n_users"))
      }: _*)).as("x"))
      .groupBy(col("x.stage").as("stage"), col("x.step").as("step"))
      .agg(sum(col("x.n_users")).as("n_users"))

  def funnelMaintainer(steps: Seq[String])
      : TableViews.Maintainer[GroupViews.RollupState] =
    GroupViews.groupedWithRollup("user_id", Seq("stage", "step"))(
      funnelStages(steps))(funnelRollup(steps))

  /** Per-user consecutive-event transition counts (lead over the
    * user's timeline), rolled up to global (from, to) pair totals. */
  def transitionPairs(live: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    live.select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("user_id"), col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  def transitionRollup(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n")).as("n"))

  def transitionMaintainer()
      : TableViews.Maintainer[GroupViews.RollupState] =
    GroupViews.groupedWithRollup("user_id", Seq("from_type", "to_type"))(
      transitionPairs)(transitionRollup)

  /** Per-user cohort-retention cells: the user's cohort is the ISO week
    * of their FIRST live event (group-local — it moves when their
    * earliest event is deleted), and one DISTINCT (user, cohort, k) row
    * marks activity k weeks later. Distinctness makes the (cohort, k)
    * rollup additive: each user contributes exactly 0 or 1 to a cell,
    * so n_active stays exact under deletes. */
  def retentionCells(maxWeeks: Int)(live: DataFrame): DataFrame = {
    val ev = live.select(col("user_id"),
        date_trunc("week", timestamp_micros(col("ts_us"))).cast("date")
          .as("wk"))
      .distinct()
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    ev.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort"),
              floor(datediff(col("wk"), col("cohort")) / 7).cast("int")
                .as("k"))
      .filter(col("k") <= maxWeeks)
      .distinct()
  }

  def retentionRollup(cells: DataFrame): DataFrame =
    cells.groupBy(col("cohort"), col("k"))
      .agg(count(lit(1)).as("n_active"))

  def retentionMaintainer(maxWeeks: Int = 3)
      : TableViews.Maintainer[GroupViews.RollupState] =
    GroupViews.groupedWithRollup("user_id", Seq("cohort", "k"))(
      retentionCells(maxWeeks))(retentionRollup)

  /** Per-type daily anomaly scores: z of each day's event count against
    * the trailing 7-day window — group-local by EVENT TYPE (one
    * changed event re-derives only its type's daily series; the window
    * chain after the day's count is O(days-per-type)). */
  def anomalyScores(live: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    live
      .groupBy(to_date(timestamp_micros(col("ts_us"))).as("day"),
               col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sd", stddev_samp(col("n")).over(w))
      .withColumn("z", when(col("sd") > 0,
                            (col("n") - col("mu")) / col("sd")))
      .select(col("day"), col("event_type"), col("n"),
              round(col("mu"), 4).as("mu"),
              round(col("sd"), 4).as("sd"),
              round(col("z"), 4).as("z"),
              (abs(col("z")) > 2).as("is_anomaly"))
  }

  def anomalyMaintainer(): TableViews.Maintainer[DataFrame] =
    GroupViews.grouped("event_type")(anomalyScores)
}
