package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maintained data-profiling view: the stacked (col, value, n) state
  * folded from changelog deltas must profile exactly like the one-shot
  * exact profiler over the final live state — including retraction of
  * an update's before-values (Maxwell partial-`old`) and of deleted
  * rows' values. */
class ProfileViewSpec extends SparkSpec {

  private val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("maintained profile equals one-shot exact profile of live state") {
    val ev = ChangelogGen.ordersChangeEvents(spark, sfDir)
    val m = ProfileView.maintainer(cols)
    val res = TableViews.replay(ev, Seq(788918400L, 852076800L),
      Seq("o_orderkey"), Seq(m))
    val live = Materializer.liveView(
      Materializer.compact(ev, Seq("o_orderkey")))
    val direct = graft.ops.Profiler.profile(live, cols, exact = true)
    assert(rowsOf(ProfileView.view(res(m))) == rowsOf(direct),
      "maintained profile != exact profile of the live state")
  }

  test("an update's before-value retracts from the multiplicity state") {
    val ev = ChangelogGen.ordersChangeEvents(spark, sfDir)
    val m = ProfileView.maintainer(Seq("o_totalprice"))
    val res = TableViews.replay(ev, Seq(788918400L, 852076800L),
      Seq("o_orderkey"), Seq(m))
    val live = Materializer.liveView(
      Materializer.compact(ev, Seq("o_orderkey")))
    // the state's live (value -> n) map IS the live column's histogram:
    // pre-update prices of 'F' orders (changed by the update phase) must
    // be gone unless another live row still carries the same value
    val stateHist = res(m).filter(col("n") > 0)
      .select(col("v"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val liveHist = live
      .select(col("o_totalprice").cast("string").as("v"))
      .groupBy("v").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stateHist == liveHist,
      "maintained value histogram != live column histogram")
  }
}
