package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row image for the micro-changelog (top-level: Spark can't encode
  * test-class inner case classes). */
case class PairImg(id: java.lang.Long, grp: String, v: java.lang.Double)

/** The pair-multiplicity aggregate family (IncrementalAgg.minMax +
  * the batched DistinctState fold): min/max are non-subtractable like
  * count-distinct — a delete of the current max must PROMOTE the
  * runner-up value, which only works because the maintained state holds
  * every live (group, value) pair. */
class PairStateAggSpec extends SparkSpec {

  private type Img = PairImg
  private def Img(id: Long, grp: String, v: java.lang.Double) =
    PairImg(id, grp, v)

  /** RowDecoder.changeEvents-shaped micro-changelog. */
  private def evDf(rows: (String, Long, Img, Img, Seq[String])*): DataFrame = {
    import spark.implicits._
    rows.toSeq.map { case (op, ts, b, a, ch) => (op, ts, ts, b, a, ch) }
      .toDF("op", "ts", "seq", "before", "after", "changed_cols")
  }
  private def ins(ts: Long, id: Long, grp: String, v: java.lang.Double) =
    ("insert", ts, null.asInstanceOf[Img], Img(id, grp, v),
     null.asInstanceOf[Seq[String]])
  private def del(ts: Long, id: Long, grp: String, v: java.lang.Double) =
    ("delete", ts, null.asInstanceOf[Img], Img(id, grp, v),
     null.asInstanceOf[Seq[String]])

  test("delete of the current max promotes the runner-up") {
    val ev = evDf(
      ins(1, 1, "a", 10.0), ins(2, 2, "a", 7.0), ins(3, 3, "a", 1.0),
      ins(4, 4, "b", 5.0),
      del(5, 1, "a", 10.0)) // drop a's max -> 7.0 is the new max
    val got = IncrementalAgg.minMax(ev, "grp", "v").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == Map("a" -> ((1.0, 7.0)), "b" -> ((5.0, 5.0))))
  }

  test("group-moving update re-bounds BOTH groups") {
    val ev = evDf(
      ins(1, 1, "a", 9.0), ins(2, 2, "a", 5.0), ins(3, 3, "b", 1.0),
      // id=1 moves a -> b keeping v: a's max drops to 5, b's rises to 9
      ("update", 4L, Img(1L, "a", null), Img(1L, "b", 9.0), Seq("grp")))
    val got = IncrementalAgg.minMax(ev, "grp", "v").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == Map("a" -> ((5.0, 5.0)), "b" -> ((1.0, 9.0))))
  }

  test("live group whose values are all NULL reports NULL bounds") {
    val ev = evDf(ins(1, 1, "a", null), ins(2, 2, "b", 3.0))
    val rows = IncrementalAgg.minMax(ev, "grp", "v").collect()
      .map(r => (r.getString(0), r.get(1), r.get(2))).toSet
    assert(rows == Set(("a", null, null), ("b", 3.0, 3.0)))
  }

  test("minMax over the orders changelog equals a state recompute") {
    val ev = ChangelogGen.ordersChangeEvents(spark, sfDir)
    val got = IncrementalAgg.minMax(ev, "o_orderstatus", "o_totalprice")
      .select(col("o_orderstatus"),
              round(col("min_o_totalprice"), 2).as("mn"),
              round(col("max_o_totalprice"), 2).as("mx"))
    val want = ChangelogGen.ordersState(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(round(min(col("o_totalprice")), 2).as("mn"),
           round(max(col("o_totalprice")), 2).as("mx"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("moments view equals a state recompute (avg + variance)") {
    val ev = ChangelogGen.ordersChangeEvents(spark, sfDir)
    val m = IncrementalAgg.moments(ev, "o_orderstatus", "o_totalprice",
      valueCast = _.cast("decimal(18,8)"))
    val s1 = col("sum_o_totalprice").cast("double")
    val s2 = col("sumsq_o_totalprice").cast("double")
    val got = m.select(col("o_orderstatus"),
      round(s1 / col("n_rows"), 4).as("avg_p"),
      round(s2 / col("n_rows") - (s1 / col("n_rows")) *
        (s1 / col("n_rows")), 4).as("var_p"),
      col("n_rows"))
    val st = ChangelogGen.ordersState(spark, sfDir)
      .select(col("o_orderstatus"),
              col("o_totalprice").cast("decimal(18,8)").as("v"))
    val w1 = col("sv").cast("double")
    val w2 = col("sv2").cast("double")
    val want = st.groupBy(col("o_orderstatus"))
      .agg(sum(col("v")).as("sv"), sum(col("v") * col("v")).as("sv2"),
           count(lit(1)).as("n_rows"))
      .select(col("o_orderstatus"),
        round(w1 / col("n_rows"), 4).as("avg_p"),
        round(w2 / col("n_rows") - (w1 / col("n_rows")) *
          (w1 / col("n_rows")), 4).as("var_p"),
        col("n_rows"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "incremental moments diverge from state recompute")
  }

  test("delete of the current median shifts it to a neighbor") {
    val ev = evDf(
      ins(1, 1, "a", 10.0), ins(2, 2, "a", 20.0), ins(3, 3, "a", 30.0),
      ins(4, 4, "a", 40.0), ins(5, 5, "a", 50.0),
      ins(6, 6, "b", 7.0),
      del(7, 3, "a", 30.0)) // a: {10,20,40,50} -> p50 drops to 20
    val got = IncrementalAgg.percentiles(ev, "grp", "v",
        Seq(0.25, 0.5, 0.75)).collect()
      .map(r => r.getString(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(got == Map("a" -> ((10.0, 20.0, 40.0)),
                      "b" -> ((7.0, 7.0, 7.0))),
      s"got $got")
  }

  test("duplicate values weight the quantile by multiplicity, not pair count") {
    // a: {1, 5, 5, 5} — the pair state holds only TWO pairs (1×1, 5×3),
    // but p25 must see four rows: pos = ceil(.25*4) = 1 -> 1.0,
    // p50 -> pos 2 -> 5.0
    val ev = evDf(
      ins(1, 1, "a", 1.0), ins(2, 2, "a", 5.0), ins(3, 3, "a", 5.0),
      ins(4, 4, "a", 5.0))
    val got = IncrementalAgg.percentiles(ev, "grp", "v", Seq(0.25, 0.5))
      .collect().map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    assert(got == Map("a" -> ((1.0, 5.0))), s"got $got")
  }

  test("live group whose values are all NULL reports NULL percentiles") {
    val ev = evDf(ins(1, 1, "a", null), ins(2, 2, "b", 3.0))
    val rows = IncrementalAgg.percentiles(ev, "grp", "v", Seq(0.5))
      .collect().map(r => (r.getString(0), r.get(1))).toSet
    assert(rows == Set(("a", null), ("b", 3.0)))
  }

  test("percentile view over the batched state fold equals one-shot, equals a sorted-scan recompute") {
    val ev = ChangelogGen.ordersChangeEvents(spark, sfDir)
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val oneShot = IncrementalAgg.percentiles(
      ev, "o_orderstatus", "o_totalprice", ps)
    // fold the same events through the persisted-state path in 2 cuts
    val mid = 820454400L // between the snapshot cuts
    val fin = Seq(col("ts") <= mid, col("ts") > mid).foldLeft(
        IncrementalAgg.emptyDistinctState(ev, "o_orderstatus",
                                          "o_totalprice")) { (st, cond) =>
      val next = IncrementalAgg.distinctCountBatch(st,
        ev.filter(cond).localCheckpoint(), "o_orderstatus", "o_totalprice")
      IncrementalAgg.DistinctState(next.pairs.localCheckpoint(),
                                   next.groups.localCheckpoint())
    }
    val batched = IncrementalAgg.percentileView(fin, "o_orderstatus",
                                                "o_totalprice", ps)
    assert(batched.count() > 0)
    assert(batched.exceptAll(oneShot).isEmpty &&
           oneShot.exceptAll(batched).isEmpty,
      "batched percentile view diverges from one-shot")
    // independent recompute: sorted scan of the live state, position
    // max(1, ceil(p*n)) — the quantile_disc definition, computed without
    // the window/pair machinery under test
    val byGrp = ChangelogGen.ordersState(spark, sfDir)
      .select(col("o_orderstatus"), col("o_totalprice")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getDouble(1)).sorted }
    val want = byGrp.map { case (g, vs) =>
      g -> ps.map { p =>
        vs(math.max(1, math.ceil(p * vs.length).toLong).toInt - 1) }
    }
    val got = oneShot.collect()
      .map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
      .toMap
    assert(got.keySet == want.keySet)
    for (g <- want.keySet)
      assert(got(g) == want(g), s"group $g: got ${got(g)} want ${want(g)}")
  }

  test("batched DistinctState fold equals the one-shot distinctCount") {
    val full = evDf(
      ins(1, 1, "a", 1.0), ins(2, 2, "a", 1.0), ins(3, 3, "a", 2.0),
      ins(4, 4, "b", 5.0),
      del(5, 3, "a", 2.0),
      // group+value move: before carries the old values (Q3 exact path)
      ("update", 6L, Img(2L, "a", 1.0), Img(2L, "b", 5.0),
       Seq("grp", "v")),
      ins(7, 5, "c", null)) // null-valued live group -> count 0
    val oneShot = IncrementalAgg.distinctCount(full, "grp", "v")
    // fold the same events in 3 cuts through the persisted-state path
    val cuts = Seq(Seq(0L, 2L), Seq(3L, 5L), Seq(6L, 99L))
    val fin = cuts.foldLeft(
        IncrementalAgg.emptyDistinctState(full, "grp", "v")) {
      case (st, Seq(lo, hi)) =>
        val batch = full.filter(col("ts") >= lo && col("ts") <= hi)
          .localCheckpoint()
        val next = IncrementalAgg.distinctCountBatch(st, batch, "grp", "v")
        // pin like the parquet generations do, so lineage stays flat
        IncrementalAgg.DistinctState(next.pairs.localCheckpoint(),
                                     next.groups.localCheckpoint())
    }
    val batched = IncrementalAgg.distinctCountView(fin, "grp", "v")
    assert(batched.exceptAll(oneShot).isEmpty &&
           oneShot.exceptAll(batched).isEmpty,
      s"batched:\n${batched.collect().mkString("\n")}\n" +
        s"one-shot:\n${oneShot.collect().mkString("\n")}")
  }

  test("batched moments fold equals the one-shot moments") {
    val full = evDf(
      ins(1, 1, "a", 10.0), ins(2, 2, "a", 7.0), ins(3, 3, "a", 1.0),
      ins(4, 4, "b", 5.0),
      del(5, 3, "a", 1.0),
      // group+value move: retract from a, apply to b (Q3 exact path)
      ("update", 6L, Img(2L, "a", 7.0), Img(2L, "b", 9.0),
       Seq("grp", "v")),
      ins(7, 5, "c", null)) // null-valued live group stays visible
    val cast: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _.cast("decimal(18,8)")
    val oneShot = IncrementalAgg.moments(full, "grp", "v", valueCast = cast)
    val cuts = Seq(Seq(0L, 2L), Seq(3L, 5L), Seq(6L, 99L))
    val fin = cuts.foldLeft(
        IncrementalAgg.emptyMomentsState(full, "grp", "v", cast)) {
      case (st, Seq(lo, hi)) =>
        val batch = full.filter(col("ts") >= lo && col("ts") <= hi)
          .localCheckpoint()
        IncrementalAgg.momentsBatch(st, batch, "grp", "v", cast)
          .localCheckpoint() // pin like the parquet generations do
    }
    val batched = IncrementalAgg.momentsView(fin)
    assert(batched.count() > 0)
    assert(batched.exceptAll(oneShot).isEmpty &&
           oneShot.exceptAll(batched).isEmpty,
      s"batched:\n${batched.collect().mkString("\n")}\n" +
        s"one-shot:\n${oneShot.collect().mkString("\n")}")
  }

  test("moments fold: delete lands a batch before its insert") {
    // the partial (negative) group counters must be retained so the late
    // insert cancels exactly; a group netting to zero disappears
    val d = evDf(del(2, 1, "a", 4.0))
    val i = evDf(ins(1, 1, "a", 4.0), ins(3, 2, "b", 7.0))
    val st0 = IncrementalAgg.emptyMomentsState(d, "grp", "v")
    val st1 = IncrementalAgg.momentsBatch(st0, d, "grp", "v")
    assert(st1.filter(col("n_rows") < 0).count() == 1)
    val st2 = IncrementalAgg.momentsBatch(st1, i, "grp", "v")
    val got = IncrementalAgg.momentsView(st2).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
                 r.getLong(3))).toSet
    assert(got == Set(("b", 7.0, 49.0, 1L)), s"got $got")
  }

  test("cross-batch out-of-order: delete lands a batch before its insert") {
    // arrival order: delete first (net -1 pair retained), insert second
    // (net back to 0) — addition is commutative, so the final view must
    // show the key gone, NOT resurrect or double-count it
    val d = evDf(del(2, 1, "a", 4.0))
    val i = evDf(ins(1, 1, "a", 4.0), ins(3, 2, "a", 7.0))
    val st0 = IncrementalAgg.emptyDistinctState(d, "grp", "v")
    val st1 = IncrementalAgg.distinctCountBatch(st0, d, "grp", "v")
    // the negative pair must be RETAINED in state (not clamped away)
    assert(st1.pairs.filter(col("net") < 0).count() == 1)
    val st2 = IncrementalAgg.distinctCountBatch(st1, i, "grp", "v")
    val got = IncrementalAgg.distinctCountView(st2, "grp", "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L), s"got $got")
  }

  test("statically-empty detection and the bootstrap fold shortcut") {
    import org.apache.spark.sql.graft.bridge
    val ev = evDf(
      ins(1, 1, "a", 4.0), ins(2, 2, "a", 7.0), ins(3, 3, "b", 7.0),
      del(4, 2, "a", 7.0))
    // the replay's schema seeds ARE statically empty; a filtered-empty
    // frame is NOT (emptiness only provable by running it); data is not
    val seedRdd = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ev.schema)
    assert(bridge.staticallyEmpty(seedRdd),
      "zero-partition LogicalRDD seed must be statically empty")
    assert(bridge.staticallyEmpty(spark.createDataFrame(
             java.util.Collections.emptyList[org.apache.spark.sql.Row](),
             ev.schema)),
      "empty LocalRelation must be statically empty")
    assert(!bridge.staticallyEmpty(ev), "data frames are not")
    assert(!bridge.staticallyEmpty(ev.filter(lit(false))),
      "runtime-empty plans must NOT be treated as statically empty")
    // shortcut == general path on the same inputs: fold the same batch
    // into (a) the statically-empty seed (shortcut fires) and (b) a
    // runtime-empty but NOT statically-empty state (general path) —
    // identical pairs, groups, and column order
    val stSeed = IncrementalAgg.emptyDistinctState(ev, "grp", "v")
    assert(bridge.staticallyEmpty(stSeed.pairs))
    val stGeneral = IncrementalAgg.DistinctState(
      stSeed.pairs.filter(lit(true)).filter(col("net") =!= Long.MinValue),
      stSeed.groups.filter(lit(true))
        .filter(col("n_rows") =!= Long.MinValue))
    assert(!bridge.staticallyEmpty(stGeneral.pairs))
    val a = IncrementalAgg.distinctCountBatch(stSeed, ev, "grp", "v")
    val b = IncrementalAgg.distinctCountBatch(stGeneral, ev, "grp", "v")
    assert(a.pairs.columns.toSeq == b.pairs.columns.toSeq)
    assert(a.groups.columns.toSeq == b.groups.columns.toSeq)
    assert(a.pairs.collect().map(_.toString).sorted.toSeq ==
             b.pairs.collect().map(_.toString).sorted.toSeq,
      "bootstrap fold shortcut diverges from the general path (pairs)")
    assert(a.groups.collect().map(_.toString).sorted.toSeq ==
             b.groups.collect().map(_.toString).sorted.toSeq,
      "bootstrap fold shortcut diverges from the general path (groups)")
  }
}
