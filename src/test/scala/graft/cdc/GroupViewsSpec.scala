package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-restricted per-group recompute views (GroupViews) and the
  * sequential-pattern instantiations (SequentialViews): the maintained
  * view after any batching must equal the direct computation over the
  * final live state, retraction must be exact (counts net out, zero
  * keys drop), and the over-cap distributed fallback must agree with
  * the broadcast path. */
case class GvEv(op: String, ts: Long, seq: Long, event_id: Long,
                ts_us: Long, user_id: Long, event_type: String,
                value: Double)

class GroupViewsSpec extends SparkSpec {

  private val cuts = Seq(ChangelogGen.EvT1, ChangelogGen.EvT2)
  private val pk = Seq("event_id")
  private val steps = Seq("view", "click", "purchase")

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def liveOf(ev: DataFrame): DataFrame =
    Materializer.liveView(Materializer.compact(ev, pk))

  test("maintained sequential views equal direct recompute over the " +
       "final live state") {
    val ev = ChangelogGen.eventsChangeEvents(spark, sfDir)
    val mSess = SequentialViews.sessionMaintainer()
    val mFun = SequentialViews.funnelMaintainer(steps)
    val mTrans = SequentialViews.transitionMaintainer()
    val res = TableViews.replay(ev, cuts, pk, Seq(mSess, mFun, mTrans))
    val live = liveOf(ev)

    assert(rowsOf(res(mSess)) ==
             rowsOf(SequentialViews.sessionSummary(1800L * 1000000L)(live)),
      "maintained session view != direct sessionization of the live state")

    val directStages = SequentialViews.funnelStages(steps)(live)
    assert(rowsOf(res(mFun).rows) == rowsOf(directStages),
      "maintained funnel stage rows != direct stage recompute")
    assert(rowsOf(res(mFun).totals) ==
             rowsOf(SequentialViews.funnelRollup(steps)(directStages)
               .filter(col("n_users") =!= 0)),
      "additively-maintained funnel totals != direct rollup")

    val mAnom = SequentialViews.anomalyMaintainer()
    val resA = TableViews.replay(ev, cuts, pk, Seq(mAnom))
    assert(rowsOf(resA(mAnom)) ==
             rowsOf(SequentialViews.anomalyScores(live)),
      "maintained anomaly view != direct per-type recompute")

    val directPairs = SequentialViews.transitionPairs(live)
    assert(rowsOf(res(mTrans).totals) ==
             rowsOf(SequentialViews.transitionRollup(directPairs)
               .filter(col("n") =!= 0)),
      "additively-maintained transition totals != direct rollup")
  }

  test("maintained retention cells equal direct recompute (cohort moves " +
       "when a user's earliest event dies)") {
    val ev = ChangelogGen.eventsChangeEvents(spark, sfDir)
    val m = SequentialViews.retentionMaintainer(maxWeeks = 3)
    val res = TableViews.replay(ev, cuts, pk, Seq(m))
    val live = liveOf(ev)
    val directCells = SequentialViews.retentionCells(3)(live)
    assert(rowsOf(res(m).rows) == rowsOf(directCells),
      "maintained retention cells != direct recompute")
    assert(rowsOf(res(m).totals) ==
             rowsOf(SequentialViews.retentionRollup(directCells)
               .filter(col("n_active") =!= 0)),
      "additively-maintained retention totals != direct rollup")
  }

  test("maintained md5-priority sample equals direct top-k over the " +
       "live state") {
    val ev = ChangelogGen.eventsChangeEvents(spark, sfDir)
    val plant = TableViews.withDerived("event_id", "__h")(
      c => md5(c.cast("string"))) _
    val m = TableViews.mapCtx(
      IncrementalTopK.maintainer("event_type", "__h", k = 5))(plant)(
      _.withColumn("__h", md5(col("event_id").cast("string"))))
    val res = TableViews.replay(ev, cuts, pk, Seq(m))
    val directLive = Materializer.liveView(
      Materializer.compact(plant(ev), pk))
    val direct = IncrementalTopK.topK(directLive, pk, "event_type",
                                      "__h", k = 5)
    assert(rowsOf(res(m)) == rowsOf(direct),
      "maintained sample != direct top-k by md5 priority over live state")
  }

  test("over-cap distributed fallback equals the broadcast path") {
    val ev = ChangelogGen.eventsChangeEvents(spark, sfDir)
    def run(maxLocalKeys: Int): Set[String] = {
      val m = SequentialViews.sessionMaintainer()
      rowsOf(TableViews.replay(ev, cuts, pk, Seq(m),
        maxLocalKeys = maxLocalKeys)(m))
    }
    assert(run(1) == run(JoinView.DefaultMaxLocalKeys),
      "over-cap (distributed) session view != under-cap (broadcast)")
  }

  test("NULL group rows recompute and retract like any other group") {
    // a decode failure can yield user_id = NULL; the null-safe group
    // joins must keep re-computing that group (a null-unsafe anti/semi
    // pair would park its rows in the view forever)
    def ev(op: String, ts: Long, id: Long, user: String, us: Long) =
      s"""{"database":"${ChangelogGen.Database}","table":"events",""" +
        s""""type":"$op","ts":$ts,"data":{"event_id":$id,"ts_us":$us,""" +
        s""""user_id":$user,"event_type":"view","value":1.0}}"""
    val lines = Seq(
      ev("insert", 1, 1L, "null", 1000000L),
      ev("insert", 2, 2L, "null", 2000000L),
      ev("insert", 3, 3L, "7", 1000000L),
      ev("delete", 11, 2L, "null", 2000000L))
    val events = RowDecoder.changeEvents(
      Maxwell.parseEnvelope(
        spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)),
      ChangelogGen.eventsSpec)
    val m = SequentialViews.sessionMaintainer()
    val res = TableViews.replay(events, Seq(5L), pk, Seq(m))
    val live = liveOf(events)
    assert(rowsOf(res(m)) ==
             rowsOf(SequentialViews.sessionSummary(1800L * 1000000L)(live)),
      "null-group session rows diverged from direct recompute")
    val nullRows = res(m).filter(col("user_id").isNull).collect()
    assert(nullRows.length == 1 && nullRows.head.getLong(2) == 1L,
      s"null group must retract the deleted event: ${nullRows.mkString}")
  }

  test("retraction is exact: deleting a user's bridging events merges " +
       "sessions, retracts funnel stages, and drops zeroed totals rows") {
    val gap = 1800L * 1000000L
    // user 1 walks the whole funnel; the click also BRIDGES two session
    // windows (view .. click < gap, click .. purchase < gap, but
    // view .. purchase > gap). Deleting the click must: merge nothing
    // (it SPLITS the session into two: [view], [purchase]), retract
    // funnel stages 2 and 3, and leave user 2 untouched.
    val t0 = 1000L * 1000000L
    val evs = List(
      GvEv("insert", 10, 0, 1L, t0, 1L, "view", 1.0),
      GvEv("insert", 10, 1, 2L, t0 + gap - 1, 1L, "click", 1.0),
      GvEv("insert", 10, 2, 3L, t0 + 2 * gap - 2, 1L, "purchase", 1.0),
      GvEv("insert", 10, 3, 4L, t0, 2L, "view", 1.0),
      GvEv("delete", 20, 4, 2L, t0 + gap - 1, 1L, "click", 1.0))
    def frame(l: List[GvEv]): DataFrame =
      spark.createDataFrame(l)
        .select(col("op"), col("ts"), col("seq"),
                struct(col("event_id"), col("ts_us"), col("user_id"),
                       col("event_type"), col("value")).as("after"))
        .withColumn("before", when(lit(false), col("after")))
    val ev = frame(evs)
    val mSess = SequentialViews.sessionMaintainer()
    val mFun = SequentialViews.funnelMaintainer(steps)
    val res = TableViews.replay(ev, cuts = Seq(15L), pk,
                                Seq(mSess, mFun))

    // sessions: user 1 has TWO single-event sessions after the delete
    val sess = res(mSess).orderBy("user_id", "sess_id").collect()
    assert(sess.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
             .toSeq ==
           Seq((1L, 1, 1L), (1L, 2, 1L), (2L, 1, 1L)),
      s"split-on-delete sessions wrong: ${sess.mkString(", ")}")

    // funnel: stage 1 keeps both users; stages 2 and 3 retracted to
    // zero and DROPPED from the totals frame
    val totals = res(mFun).totals.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(totals == Set((1, "view", 2L)),
      s"retracted funnel totals wrong: $totals")

    // cross-check both against the direct recompute over the live state
    val live = liveOf(ev)
    assert(rowsOf(res(mSess)) ==
             rowsOf(SequentialViews.sessionSummary(gap)(live)))
    assert(rowsOf(res(mFun).rows) ==
             rowsOf(SequentialViews.funnelStages(steps)(live)))
  }
}
