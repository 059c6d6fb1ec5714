package graft.dedup

import graft.SparkSpec
import graft.cdc.{Materializer, TableViews}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maintained near-dup clusters: connected components over a maintained
  * exact-cosine edge set must equal the from-scratch recompute over the
  * live corpus after every batch — including the hard direction (a
  * deleted bridge SPLITS its component) — while probing only the
  * changed vectors per batch. */
class ClusterViewSpec extends SparkSpec {

  private val Tau = 0.9

  /** Unit vector at `deg` degrees: cosine between two = cos(Δθ), so an
    * edge exists iff |Δθ| < acos(0.9) ≈ 25.8°. */
  private def vec(deg: Double): Seq[Double] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r), math.sin(r))
  }

  private def events(rows: Seq[(String, Long, Long, Long, Seq[Double])])
      : DataFrame = {
    import spark.implicits._
    rows.toDF("op", "ts", "seq", "vec_id", "embedding")
      .select(col("op"), col("ts"), col("seq"),
              struct(col("vec_id"), col("embedding")).as("after"))
  }

  // b1: chain 1-2-3 (0°,20°,40°), pair 4-5 (90°,110°), singleton 6 (180°)
  // b2: 3 re-embeds to 75° (leaves 1-2, bridges 4-5); 7 arrives at 182°
  // b3: delete 2 (1 isolated) and 4 (the bridge: {3,5} SPLITS — 35° apart)
  private val log = Seq(
    ("insert", 1L, 1L, 1L, vec(0)), ("insert", 2L, 2L, 2L, vec(20)),
    ("insert", 3L, 3L, 3L, vec(40)), ("insert", 4L, 4L, 4L, vec(90)),
    ("insert", 5L, 5L, 5L, vec(110)), ("insert", 6L, 6L, 6L, vec(180)),
    ("update", 11L, 7L, 3L, vec(75)), ("insert", 12L, 8L, 7L, vec(182)),
    ("delete", 21L, 9L, 2L, vec(20)), ("delete", 22L, 10L, 4L, vec(90)))

  private def clustersOf(st: ClusterView.ClusterState)
      : Set[(Long, Long, Boolean)] =
    ClusterView.view(st).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  private def direct(live: DataFrame): Set[(Long, Long, Boolean)] = {
    val a = live.select(col("vec_id").as("id_a"),
                        col("embedding").cast("array<double>").as("va"))
    val b = live.select(col("vec_id").as("id_b"),
                        col("embedding").cast("array<double>").as("vb"))
    val edges = a.join(b, col("id_a") < col("id_b"))
      .filter(graft.functions.VectorFunctions.cosine(col("va"), col("vb"))
                >= Tau)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comps = Dedup.connectedComponents(edges, "src", "dst",
                                          shufflePartitions = 4)
    live.select(col("vec_id"))
      .join(comps, col("vec_id") === col("id"), "left")
      .select(col("vec_id"),
              coalesce(col("component"), col("vec_id")).as("cluster"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(1) == r.getLong(0)))
      .toSet
  }

  private def replayed(ev: DataFrame, cuts: Seq[Long],
                       maxLocalKeys: Int = 100000)
      : (DataFrame, ClusterView.ClusterState) = {
    val m = ClusterView.cosineMaintainer("vec_id", "embedding", Tau,
                                         ccShufflePartitions = 4)
    val res = TableViews.replay(ev, cuts, Seq("vec_id"), Seq(m),
                                maxLocalKeys = maxLocalKeys)
    (Materializer.liveView(res.state), res(m))
  }

  test("stepwise: migrate merges, bridge delete splits, every prefix == direct") {
    for (cut <- Seq(10L, 20L, 30L)) {
      val ev = events(log.filter(_._2 <= cut))
      val (live, st) = replayed(ev, cuts = Seq(10L, 20L))
      assert(clustersOf(st) == direct(live), s"prefix ts<=$cut diverged")
    }
    // and the landmark shapes, spelled out
    val (_, st1) = replayed(events(log.filter(_._2 <= 10)), Seq.empty)
    assert(clustersOf(st1) == Set((1L, 1L, true), (2L, 1L, false),
      (3L, 1L, false), (4L, 4L, true), (5L, 4L, false), (6L, 6L, true)))
    val (_, st3) = replayed(events(log), Seq(10L, 20L))
    assert(clustersOf(st3) == Set((1L, 1L, true), (3L, 3L, true),
      (5L, 5L, true), (6L, 6L, true), (7L, 6L, false)),
      "bridge deletes must isolate 1 and split {3,5}")
  }

  test("batching invariance: one batch == three batches") {
    val ev = events(log)
    assert(clustersOf(replayed(ev, Seq.empty)._2) ==
           clustersOf(replayed(ev, Seq(10L, 20L))._2))
  }

  test("over-cap distributed fallback matches the driver-local path") {
    val ev = events(log)
    assert(clustersOf(replayed(ev, Seq(10L, 20L), maxLocalKeys = 1)._2) ==
           clustersOf(replayed(ev, Seq(10L, 20L))._2))
  }

  /** From-scratch LSH-edge clusters: CC over the batch operator's
    * bucketed near-dup edges (same LSH seed as the maintainer). */
  private def directLsh(live: DataFrame): Set[(Long, Long, Boolean)] = {
    val edges = Dedup.embeddingNearDups(
        live.select(col("vec_id"),
                    col("embedding").cast("array<double>").as("embedding")),
        "vec_id", "embedding", dim = 2, minCosine = Tau)
      .select(col("id_a").cast("long").as("src"),
              col("id_b").cast("long").as("dst"))
    val comps = Dedup.connectedComponents(edges, "src", "dst",
                                          shufflePartitions = 4)
    live.select(col("vec_id"))
      .join(comps, col("vec_id") === col("id"), "left")
      .select(col("vec_id"),
              coalesce(col("component"), col("vec_id")).as("cluster"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(1) == r.getLong(0)))
      .toSet
  }

  private def replayedLsh(ev: DataFrame, cuts: Seq[Long],
                          maxLocalKeys: Int = 100000)
      : (DataFrame, ClusterView.IndexedClusterState) = {
    val m = ClusterView.semanticMaintainer("vec_id", "embedding", dim = 2,
      minCosine = Tau, ccShufflePartitions = 4)
    val res = TableViews.replay(ev, cuts, Seq("vec_id"), Seq(m),
                                maxLocalKeys = maxLocalKeys)
    (Materializer.liveView(res.state), res(m))
  }

  private def clustersOfIdx(st: ClusterView.IndexedClusterState)
      : Set[(Long, Long, Boolean)] =
    ClusterView.view(st).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  test("overIndex: maintained LSH clusters == from-scratch after every prefix") {
    for (cut <- Seq(10L, 20L, 30L)) {
      val ev = events(log.filter(_._2 <= cut))
      val (live, st) = replayedLsh(ev, cuts = Seq(10L, 20L))
      assert(clustersOfIdx(st) == directLsh(live),
        s"LSH cluster prefix ts<=$cut diverged from from-scratch")
    }
  }

  test("overIndex: over-cap fallback and batching invariance") {
    val ev = events(log)
    val base = clustersOfIdx(replayedLsh(ev, Seq(10L, 20L))._2)
    assert(clustersOfIdx(replayedLsh(ev, Seq.empty)._2) == base)
    assert(clustersOfIdx(replayedLsh(ev, Seq(10L, 20L),
                                     maxLocalKeys = 1)._2) == base)
  }

  test("edge prober only ever sees the changed vectors") {
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val m = ClusterView.maintainerFromEdges("vec_id",
      (changedLive, liveAll) => {
        seen += changedLive.count()
        val a = changedLive.select(col("vec_id").cast("long").as("id_a"),
          col("embedding").cast("array<double>").as("va"))
        val b = liveAll.select(col("vec_id").cast("long").as("id_b"),
          col("embedding").cast("array<double>").as("vb"))
        a.join(b, col("id_a") =!= col("id_b"))
          .filter(graft.functions.VectorFunctions
            .cosine(col("va"), col("vb")) >= Tau)
          .select(least(col("id_a"), col("id_b")).as("src"),
                  greatest(col("id_a"), col("id_b")).as("dst"))
          .distinct()
      }, ccShufflePartitions = 4)
    val res = TableViews.replay(events(log), Seq(10L, 20L), Seq("vec_id"),
                                Seq(m))
    res(m).clusters.count()
    // batch 1: 6 live inserts; batch 2: update + insert = 2; batch 3:
    // two deletes leave NO changed live rows — the prober sees zero
    assert(seen.toSeq == Seq(6L, 2L, 0L),
      s"prober inputs were $seen — not |Δ|-bounded")
  }

  test("exact modality refuses an over-bound live corpus, naming the swap") {
    // the |Δ|×|live| probe is the modality's point, but it must fail
    // LOUDLY past the bound instead of burning n² cosine evals per
    // batch — and the error must route the caller to the LSH path
    val ev = events(log.filter(_._1 == "insert"))
    val m = ClusterView.cosineMaintainer("vec_id", "embedding", Tau,
                                         ccShufflePartitions = 4,
                                         maxLiveRows = 3)
    val e = intercept[IllegalArgumentException] {
      TableViews.replay(ev, Seq(10L), Seq("vec_id"), Seq(m))
    }
    assert(e.getMessage.contains("semanticMaintainer") &&
             e.getMessage.contains("overIndex"),
      s"guard must name the LSH swap: ${e.getMessage}")
    // under the bound the same corpus replays fine (guard is inert)
    val ok = ClusterView.cosineMaintainer("vec_id", "embedding", Tau,
                                          ccShufflePartitions = 4,
                                          maxLiveRows = 100)
    val res = TableViews.replay(ev, Seq(10L), Seq("vec_id"), Seq(ok))
    assert(clustersOf(res(ok)) ==
             direct(Materializer.liveView(res.state)))
  }

  test("amortized bound recounts under churn instead of refusing a live corpus that fits") {
    // the optimistic tracker only ADDS per-batch changed-key counts, so
    // delete-heavy churn drives it past the bound while the true live
    // count stays under — crossing must trigger a RECOUNT (and pass),
    // never a refusal. Bound 6; batch 1 inserts 6 (live 6); batch 2
    // touches 4 keys (2 deletes + 2 re-inserts at new angles) pushing
    // the optimistic count to 10 > 6 while live stays 6.
    val churn = Seq(
      ("insert", 1L, 1L, 1L, vec(0)), ("insert", 2L, 2L, 2L, vec(20)),
      ("insert", 3L, 3L, 3L, vec(40)), ("insert", 4L, 4L, 4L, vec(90)),
      ("insert", 5L, 5L, 5L, vec(110)), ("insert", 6L, 6L, 6L, vec(180)),
      ("delete", 11L, 7L, 2L, vec(20)), ("delete", 12L, 8L, 4L, vec(90)),
      ("insert", 13L, 9L, 8L, vec(30)), ("insert", 14L, 10L, 9L, vec(100)))
    val m = ClusterView.cosineMaintainer("vec_id", "embedding", Tau,
                                         ccShufflePartitions = 4,
                                         maxLiveRows = 6)
    val res = TableViews.replay(events(churn), Seq(10L), Seq("vec_id"),
                                Seq(m))
    assert(clustersOf(res(m)) == direct(Materializer.liveView(res.state)),
      "post-recount clusters diverged from the direct recompute")
    // and a corpus that genuinely outgrows the bound still refuses
    val grow = churn ++ Seq(("insert", 15L, 11L, 10L, vec(60)))
    val e = intercept[IllegalArgumentException] {
      TableViews.replay(events(grow), Seq(10L, 14L), Seq("vec_id"),
        Seq(ClusterView.cosineMaintainer("vec_id", "embedding", Tau,
          ccShufflePartitions = 4, maxLiveRows = 6)))
    }
    assert(e.getMessage.contains("LSH-bucketed path"), e.getMessage)
  }
}
