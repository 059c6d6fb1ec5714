package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-topic snowflake-chain shared replay: one replay of
  * lineitem→orders→customer must equal the direct recompute over the
  * final table states, degenerate to [[MultiView]] at N=2, stay exact on
  * the distributed over-cap path, and propagate deep-dimension changes
  * (a customer delete retracting grandchild lineitems) through the
  * effective-key cascade. */
class SnowflakeViewSpec extends SparkSpec {

  private val cuts = Seq(788918400L, 852076800L) // CdcQueries' snap times
  private val pks = Seq(Seq("l_orderkey", "l_linenumber"),
                        Seq("o_orderkey"), Seq("c_custkey"))
  private val fks = Seq(Seq("l_orderkey"), Seq("o_custkey"))
  private val revenue = (c: Column) =>
    (c * (lit(1.0) - col("l_discount"))).cast("decimal(25,10)")

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def chainEvents = Seq(
    ChangelogGen.lineitemChangeEvents(spark, sfDir),
    ChangelogGen.ordersChangeEvents(spark, sfDir),
    ChangelogGen.customerChangeEvents(spark, sfDir))

  test("3-table maintained views equal the direct recompute over final states") {
    val mAgg = JoinAggView.maintainerNamed(Seq("c_nationkey"),
      Seq(("revenue", "l_extendedprice", revenue)))
    val viewCols = Seq("l_orderkey", "l_linenumber", "l_extendedprice",
                       "o_orderstatus", "c_nationkey", "c_name")
    val mJoin = JoinView.maintainer(viewCols)
    val res = SnowflakeView.replay(chainEvents, pks, fks, cuts,
                                   Seq(mAgg, mJoin))
    // final table states must equal a plain per-topic materialization
    val expected = Seq(
      Materializer.currentState(chainEvents(0), pks(0)),
      Materializer.currentState(chainEvents(1), pks(1)),
      Materializer.currentState(chainEvents(2), pks(2)))
    res.tables.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
      assert(rowsOf(Materializer.liveView(got)) ==
               rowsOf(Materializer.liveView(want)),
        s"table state $i != direct materialization")
    }
    val liveLi = Materializer.liveView(res.tables(0))
    val liveO = Materializer.liveView(res.tables(1))
    val liveC = Materializer.liveView(res.tables(2))
    val dims = liveO.join(liveC, col("o_custkey") === col("c_custkey"))
    // maintained aggregate == direct recompute over the final chain join
    val directAgg = JoinAggView.directAggNamed(liveLi, dims,
      pks(1), fks(0), Seq("c_nationkey"),
      Seq(("revenue", "l_extendedprice", revenue)))
    assert(rowsOf(res(mAgg)) == rowsOf(directAgg),
      "snowflake aggregate != direct recompute")
    assert(res(mAgg).count() > 0, "aggregate view is empty")
    // maintained inner view == direct 3-table join
    val directView = liveLi
      .join(dims, col("l_orderkey") === col("o_orderkey"))
      .select(viewCols.map(col): _*)
    assert(rowsOf(res(mJoin)) == rowsOf(directView),
      "snowflake inner view != direct 3-table join")
  }

  test("N=2 degenerates to MultiView") {
    val lEv = ChangelogGen.ordersChangeEvents(spark, sfDir)
    val rEv = ChangelogGen.customerChangeEvents(spark, sfDir)
    val dec = (c: Column) => c.cast("decimal(25,10)")
    def agg = JoinAggView.maintainerNamed(Seq("c_nationkey"),
      Seq(("o_totalprice", "o_totalprice", dec)))
    val (mSnow, mMulti) = (agg, agg)
    val snow = SnowflakeView.replay(Seq(lEv, rEv),
      Seq(Seq("o_orderkey"), Seq("c_custkey")), Seq(Seq("o_custkey")),
      cuts, Seq(mSnow))
    val multi = MultiView.replay(lEv, rEv, cuts,
      Seq("o_orderkey"), Seq("c_custkey"), Seq("o_custkey"), Seq(mMulti))
    assert(rowsOf(snow(mSnow)) == rowsOf(multi(mMulti)),
      "N=2 snowflake replay != MultiView replay")
    assert(rowsOf(snow.tables(0)) == rowsOf(multi.left) &&
             rowsOf(snow.tables(1)) == rowsOf(multi.right),
      "N=2 snowflake table states != MultiView states")
  }

  test("auto-cut backlog == manual cuts == one giant batch") {
    def run(cs: Seq[Long], maxPerBatch: Option[Int]): Set[String] = {
      val m = JoinAggView.maintainerNamed(Seq("c_nationkey"),
        Seq(("revenue", "l_extendedprice", revenue)))
      rowsOf(SnowflakeView.replay(chainEvents, pks, fks, cs, Seq(m),
        maxEventsPerBatch = maxPerBatch)(m))
    }
    val one = run(Seq.empty, None)
    val manual = run(cuts, None)
    val auto = run(Seq.empty, Some(2000))
    assert(auto == one, "auto-cut replay must equal the one-batch replay")
    assert(manual == one, "manual-cut replay must equal the one-batch replay")
  }

  test("over-cap fallback: distributed path stays exact") {
    def run(cap: Int): Set[String] = {
      val m = JoinAggView.maintainerNamed(Seq("c_nationkey"),
        Seq(("revenue", "l_extendedprice", revenue)))
      rowsOf(SnowflakeView.replay(chainEvents, pks, fks, cuts, Seq(m),
        maxLocalKeys = cap)(m))
    }
    // maxLocalKeys = 1 forces EVERY key collect (including the
    // effective-key propagation) onto the cluster-side fallback
    assert(run(1) == run(JoinView.DefaultMaxLocalKeys),
      "over-cap snowflake aggregate != under-cap aggregate")
  }

  test("deep-dimension change propagates through the effective-key cascade") {
    import spark.implicits._
    def events(rows: Seq[(String, Long, Long, org.apache.spark.sql.Row)],
               schema: org.apache.spark.sql.types.StructType): DataFrame = {
      val rs = rows.map { case (op, ts, seq, after) =>
        org.apache.spark.sql.Row(op, ts, seq, after) }
      spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rs).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("op",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("seq",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("after", schema))))
    }
    import org.apache.spark.sql.types._
    val fSchema = StructType(Seq(StructField("fid", LongType),
      StructField("ford", LongType), StructField("amt", DoubleType)))
    val oSchema = StructType(Seq(StructField("oid", LongType),
      StructField("ocust", LongType)))
    val cSchema = StructType(Seq(StructField("cid", LongType),
      StructField("cname", StringType)))
    def r(vs: Any*) = org.apache.spark.sql.Row(vs: _*)
    // batch 1 (ts<=10): chain complete for orders 10 (cust 1); order 20
    // references cust 2 who has NOT arrived yet
    // batch 2 (10<ts<=20): cust 2 arrives late; amt of fact 100 updated
    // batch 3 (ts>20): cust 1 DELETED — facts 100/101 must drop from the
    // inner view although NO fact or order event occurs in the batch
    // (pure two-level effective-key propagation)
    val fEv = events(Seq(
      ("insert", 1L, 1L, r(100L, 10L, 5.0)),
      ("insert", 1L, 2L, r(101L, 10L, 7.0)),
      ("insert", 2L, 3L, r(102L, 20L, 9.0)),
      ("update", 12L, 4L, r(100L, 10L, 6.0))), fSchema)
    val oEv = events(Seq(
      ("insert", 1L, 1L, r(10L, 1L)),
      ("insert", 2L, 2L, r(20L, 2L))), oSchema)
    val cEv = events(Seq(
      ("insert", 1L, 1L, r(1L, "a")),
      ("insert", 11L, 2L, r(2L, "b")),
      ("delete", 21L, 3L, r(1L, "a"))), cSchema)
    val viewCols = Seq("fid", "ford", "amt", "ocust", "cname")
    val mJoin = JoinView.maintainer(viewCols)
    val mLeft = LeftJoinView.maintainer(viewCols)
    val mAgg = JoinAggView.maintainerNamed(Seq("cname"),
      Seq(("amt", "amt", (c: Column) => c.cast("decimal(25,10)"))))
    val res = SnowflakeView.replay(Seq(fEv, oEv, cEv),
      pks = Seq(Seq("fid"), Seq("oid"), Seq("cid")),
      fks = Seq(Seq("ford"), Seq("ocust")),
      cuts = Seq(10L, 20L), maintainers = Seq(mJoin, mLeft, mAgg))
    val inner = res(mJoin).collect().map(x =>
      (x.getLong(0), x.getDouble(2), x.getString(4))).toSet
    assert(inner == Set((102L, 9.0, "b")),
      s"inner snowflake view after deep delete: $inner")
    val left = res(mLeft).collect().map(x =>
      (x.getLong(0), x.getDouble(2), Option(x.getString(4)))).toSet
    assert(left == Set((100L, 6.0, None), (101L, 7.0, None),
                       (102L, 9.0, Some("b"))),
      s"left snowflake view must re-pad the deep-deleted facts: $left")
    val agg = res(mAgg).collect().map(x =>
      (x.getString(0), x.getLong(1))).toSet
    assert(agg == Set(("b", 1L)),
      s"aggregate must retract the deep-deleted facts' groups: $agg")
  }
}
