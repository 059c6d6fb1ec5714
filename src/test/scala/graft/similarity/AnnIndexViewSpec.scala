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
}
