package graft.similarity

import graft.SparkSpec
import graft.cdc.{ChangelogGen, Materializer, TableViews}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incrementally maintained IVF assignment table must equal a
  * from-scratch `ivfAssign` over the live corpus after every batch —
  * while only re-assigning changed vectors; the float arrays must ride
  * the Maxwell JSON envelope bit-exact. */
class AnnIndexViewSpec extends SparkSpec {

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def centroids: DataFrame =
    graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), col("embedding"))

  test("maintained IVF assignments equal the from-scratch build; floats decode bit-exact") {
    val ev = ChangelogGen.embeddingsChangeEvents(spark, sfDir)
    val m = AnnIndexView.maintainer("vec_id", "embedding",
      AnnIndexView.localCentroids(centroids))
    val res = TableViews.replay(ev,
      Seq(ChangelogGen.DocT1, ChangelogGen.DocT2), Seq("vec_id"), Seq(m))
    val live = Materializer.liveView(res.state)
      .select(col("vec_id"), col("embedding"))

    // float arrays survived the JSON envelope bit-exact: the live state
    // IS the closed-form expected state over the parquet originals
    val base = graft.Tables.load(spark, sfDir, "embeddings")
    val donor = base.select((col("vec_id") - 1).as("vec_id"),
                            col("embedding").as("dv"))
    val expected = base.join(donor, Seq("vec_id"), "left")
      .filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id"),
              when(col("vec_id") % 7 === 0,
                   coalesce(col("dv"), col("embedding")))
                .otherwise(col("embedding")).as("embedding"))
    assert(rowsOf(live) == rowsOf(expected),
      "live vector state != closed-form expected state (JSON decode drift?)")

    // maintained inverted lists == from-scratch assignment of the live corpus
    assert(rowsOf(res(m)) == rowsOf(Similarity.ivfAssign(live, centroids)),
      "maintained IVF assignments != from-scratch ivfAssign")

    // over-cap distributed path lands on the same table
    val res2 = TableViews.replay(ev,
      Seq(ChangelogGen.DocT1, ChangelogGen.DocT2), Seq("vec_id"),
      Seq(m), maxLocalKeys = 1)
    assert(rowsOf(res2(m)) == rowsOf(res(m)),
      "over-cap distributed path diverges")
  }

  test("IVF probe off the maintained index matches the batch-built index") {
    val ev = ChangelogGen.embeddingsChangeEvents(spark, sfDir)
    val m = AnnIndexView.maintainer("vec_id", "embedding",
      AnnIndexView.localCentroids(centroids))
    val res = TableViews.replay(ev,
      Seq(ChangelogGen.DocT1, ChangelogGen.DocT2), Seq("vec_id"), Seq(m))
    val live = Materializer.liveView(res.state)
      .select(col("vec_id"), col("embedding"))
    val probes = graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def served(assigned: DataFrame): Set[String] =
      rowsOf(Similarity.ivfTopK(assigned, centroids, probes,
                                k = 3, nprobe = 3)
        .select(col("q_id"), col("rk"), col("neighbor_id"),
                round(col("cos"), 6).as("cos")))
    assert(served(res(m)) == served(Similarity.ivfAssign(live, centroids)),
      "probe results diverge between maintained and batch-built index")
  }

  test("cdc_ann_ivf serve plan: only filtered probe/centroid scans, index off state") {
    // the maintained inverted lists are pinned state — a serve that
    // rescanned the embeddings parquet unfiltered would re-bill the
    // index build to every probe. The only parquet reads allowed are
    // the two tiny id-filtered scans (probe sources, fixed centroids),
    // and the probe side must reach the candidate join as a broadcast.
    val q = graft.ops.CdcQueries.queries("cdc_ann_ivf")
    q(spark, sfDir).count() // force the shared state build
    val plan = q(spark, sfDir).queryExecution.executedPlan
    val scans = plan.collectLeaves().map(_.toString)
      .filter(_.contains("Scan parquet"))
    assert(scans.size <= 2,
      s"cdc_ann_ivf serve reads ${scans.size} parquet scans:\n" +
        scans.mkString("\n"))
    // each scan must carry a PUSHED vec_id predicate — asserting on the
    // output schema alone is vacuous (a FileSourceScanExec's toString
    // always names its columns), so look inside PushedFilters
    assert(scans.forall(s => {
      val pushed = s.split("PushedFilters: ").lift(1).getOrElse("")
      pushed.contains("vec_id")
    }), s"expected a pushed vec_id filter on every serve scan:\n" +
      scans.mkString("\n"))
    val planStr = plan.toString
    assert(planStr.contains("BroadcastExchange") ||
             planStr.contains("BroadcastNestedLoopJoin"),
      "probe/centroid sides must broadcast into the candidate join")
  }

  test("maintained drift moments equal the from-scratch stat after every batch") {
    val ev = ChangelogGen.embeddingsChangeEvents(spark, sfDir)
    val codebook = AnnIndexView.localCentroids(centroids)
    // batching invariance incl. the over-cap fallback: the face must
    // land on the same exact decimal moments as a one-shot compute over
    // the live corpus (re-embeds RETRACT their old distance exactly)
    for ((cuts, mlk) <- Seq(
           (Seq.empty[Long], 100000),
           (Seq(ChangelogGen.DocT1, ChangelogGen.DocT2), 100000),
           (Seq(ChangelogGen.DocT1, ChangelogGen.DocT2), 1))) {
      val m = AnnIndexView.driftMaintainer("vec_id", "embedding", codebook)
      val res = TableViews.replay(ev, cuts, Seq("vec_id"), Seq(m),
                                  maxLocalKeys = mlk)
      val live = Materializer.liveView(res.state)
        .select(col("vec_id"), col("embedding"))
      val cv = centroids.select(col("vec_id").as("centroid_id"),
                                col("embedding").as("cvec"))
      val d6 = Similarity.ivfAssign(live, centroids)
        .join(broadcast(cv), Seq("centroid_id"))
        .select(col("centroid_id"),
                round(graft.functions.VectorFunctions.l2Distance(
                        col("embedding"), col("cvec")), 6)
                  .cast("decimal(18,6)").as("d6"))
      val mean = col("s").cast("double") / col("n")
      val scratch = d6.groupBy(col("centroid_id"))
        .agg(count(lit(1)).as("n"), sum(col("d6")).as("s"),
             sum(col("d6") * col("d6")).as("ss"))
        .select(col("centroid_id"), col("n").as("n_vecs"),
                round(mean, 6).as("avg_dist"),
                round(col("ss").cast("double") / col("n") - mean * mean, 6)
                  .as("var_dist"))
      assert(rowsOf(AnnIndexView.driftView(res(m))) == rowsOf(scratch),
        s"maintained drift face != from-scratch stat (cuts=$cuts, " +
          s"maxLocalKeys=$mlk)")
    }
  }

  test("planted drift trips the threshold; retrain-and-swap restores planted-probe recall") {
    // A FROZEN coarse quantizer over a corpus that walks away from it:
    // two base clusters own the two codebook centroids; a drifted
    // cluster then lands BETWEEN them, split across both inverted lists
    // by the stale codebook — so a drifted probe's true neighbor can sit
    // in the list the probe does NOT visit at nprobe=1 (silent recall
    // loss, invisible to the probe itself). The drift face is the
    // observable symptom; retraining restores recall.
    def vec(x: Double, y: Double) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    def line(op: String, ts: Long, id: Long, v: Seq[Float]): String =
      s"""{"database":"${ChangelogGen.Database}","table":"embeddings",""" +
        s""""type":"$op","ts":$ts,"data":{"vec_id":$id,""" +
        s""""embedding":[${v.mkString(",")}],"label":0}}"""
    def events(lines: Seq[String]): DataFrame =
      graft.cdc.RowDecoder.changeEvents(
        graft.cdc.Maxwell.parseEnvelope(
          spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)),
        ChangelogGen.embeddingsSpec)
    val stale = Seq((0L, vec(10, 0)), (1L, vec(0, 10)))
    val base = (1L to 5L).map(i => line("insert", 1, i,
                 vec(10 + 0.01 * i, 0))) ++
               (11L to 15L).map(i => line("insert", 1, i,
                 vec(0, 10 + 0.01 * (i - 10))))
    // the drifted cluster around (5, 5): id 21 tilts a hair toward c1's
    // side of the diagonal, the probe's source (id 22) toward c0's —
    // nearest-centroid splits the near-identical (cosine-nearest!) pair
    // across the two stale lists; 23..28 pad c0's side of the cluster
    // and are all ANGULARLY farther from the probe than 21 is
    val drifted = Seq(line("insert", 11, 21, vec(4.99, 5.01)),
                      line("insert", 11, 22, vec(5.01, 4.99))) ++
      (23L to 28L).map(i => line("insert", 11, i,
        vec(5 + 0.01 * i, 5 - 0.01 * i)))
    val driftM = AnnIndexView.driftMaintainer("vec_id", "embedding", stale)
    val annM = AnnIndexView.maintainer("vec_id", "embedding", stale)
    val res = TableViews.replay(events(base ++ drifted), Seq(10L),
                                Seq("vec_id"), Seq(driftM, annM))
    // 1. the planted drift TRIPS the monitor: base-corpus assignment
    // distances are ~0.05; the drifted cluster sits ~7 L2 from either
    // stale centroid, so its lists' avg_dist blows past any sane
    // threshold (1.0 here)
    val drift = AnnIndexView.driftView(res(driftM))
    val worst = drift.agg(max(col("avg_dist"))).collect()(0).getDouble(0)
    assert(worst > 1.0,
      s"planted drift must trip the threshold (max avg_dist = $worst)")
    // ... and the pre-drift corpus alone must NOT trip it (the monitor
    // separates healthy from drifted, it doesn't just always fire)
    val baseM = AnnIndexView.driftMaintainer("vec_id", "embedding", stale)
    val resBase = TableViews.replay(events(base), Seq.empty,
                                    Seq("vec_id"), Seq(baseM))
    val calm = AnnIndexView.driftView(resBase(baseM))
      .agg(max(col("avg_dist"))).collect()(0).getDouble(0)
    assert(calm < 1.0,
      s"healthy corpus must stay under the threshold (max = $calm)")
    // 2. recall loss under the stale codebook: probe = id 22's vector;
    // its true (cosine-)nearest neighbor is id 21, but 21 lives in the
    // OTHER stale list, so nprobe=1 misses it
    val probes = spark.createDataFrame(
        Seq((22L, vec(5.01, 4.99)))).toDF("q_id", "q_vec")
      .select(col("q_id"),
              col("q_vec").cast("array<float>").as("q_vec"))
    val staleDf = AnnIndexView.centroidDf(spark, stale)
    val staleTop = Similarity.ivfTopK(res(annM), staleDf, probes,
                                      k = 1, nprobe = 1)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSeq
    assert(staleTop.nonEmpty && staleTop.head != 21L,
      s"stale codebook should MISS the cross-list neighbor, got $staleTop")
    // 3. RETRAIN-AND-SWAP: fresh quantizer + rebuilt assignment off the
    // live corpus; the drifted cluster gets its own centroid, 21 and 22
    // share a list again, recall is restored
    val live = Materializer.liveView(res.state)
    val (newBook, reassigned) = AnnIndexView.retrain(
      live, "vec_id", "embedding", k = 3, seed = 7L)
    val newDf = AnnIndexView.centroidDf(spark, newBook)
    val freshTop = Similarity.ivfTopK(reassigned, newDf, probes,
                                      k = 1, nprobe = 1)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSeq
    assert(freshTop == Seq(21L),
      s"retrained index must restore planted-probe recall, got $freshTop")
    // 4. the retrained drift monitor reads healthy again — the swap
    // closes the loop (trip -> retrain -> monitor resets)
    val afterM = AnnIndexView.driftMaintainer("vec_id", "embedding",
                                              newBook)
    val resAfter = TableViews.replay(events(base ++ drifted), Seq(10L),
                                     Seq("vec_id"), Seq(afterM))
    val healed = AnnIndexView.driftView(resAfter(afterM))
      .agg(max(col("avg_dist"))).collect()(0).getDouble(0)
    assert(healed < 1.0,
      s"retrained monitor must read healthy (max avg_dist = $healed)")
  }
}
