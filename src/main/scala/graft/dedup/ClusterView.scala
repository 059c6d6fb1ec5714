package graft.dedup

import graft.cdc.{Materializer, TableViews}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Incrementally-maintained NEAR-DUP CLUSTERS — connected components
  * over a maintained similarity-edge set, kept current from a changelog.
  * Completes the maintained dedup chain ([[DedupIndexView]] keeps the
  * signature index and the candidate pairs; this keeps what a curation
  * pass actually consumes: the cluster assignment and its min-id
  * representative) under BOTH edge inserts and edge deletes — the hard
  * direction: a deleted bridge document must SPLIT its component, which
  * no monotone union-find can do.
  *
  * Architecture — component-local recompute, the [[graft.cdc.GroupViews]]
  * discipline applied to graph state:
  *  1. edge upkeep: every edge incident to a changed id is dropped and
  *     the changed ids' edges are recomputed against the post-merge live
  *     corpus (`edgesFor`, |Δ|-bounded input by construction);
  *  2. the AFFECTED components are exactly those owning a changed id or
  *     an endpoint of a dropped/new edge — every other component's
  *     labeling cannot have changed and its rows carry over untouched;
  *  3. connected components run over ONLY the affected components'
  *     induced subgraph (component closure: an old edge never crosses
  *     components, a new edge's endpoints are both affected), with
  *     singleton fill for affected vertices left edgeless and a live
  *     restrict dropping deleted ids.
  *
  * Scale shape: per batch, edge probing is |Δ| × |live| for the exact
  * modality below (inherent to EXACT edges — swap `edgesFor` for an
  * LSH-bucketed prober to go sub-linear, [[Dedup.embeddingNearDups]]),
  * and relabeling is bounded by the affected components' size — never
  * the corpus. The labeling itself reuses [[Dedup.connectedComponents]]
  * (min-label propagation, one exchange per round).
  */
object ClusterView {

  /** Canonical `(src, dst)` edges (src < dst) + the current
    * `(id, cluster)` assignment over the live corpus. */
  final case class ClusterState(edges: DataFrame, clusters: DataFrame)

  /** Serving face: `(id, cluster, is_rep)` — min-label components make
    * the representative test `cluster == id`. */
  def view(st: ClusterState): DataFrame =
    st.clusters.select(col("id"), col("cluster"),
                       (col("cluster") === col("id")).as("is_rep"))

  /** Collect-cap a derived key frame (JoinView.localKeys discipline):
    * under `cap` rows it becomes a LocalRelation and every semi/anti
    * against it BROADCASTS — the big frames (the edge/candidate state,
    * the cluster assignment) are then pruned scan-side, never shuffled.
    * Over the cap it stays distributed (pinned — each one is scanned by
    * several joins) and those joins degrade to shuffles, the same
    * graceful fallback every maintainer uses. The stage-listener stress
    * probe is what caught the unhinted version shuffling the whole
    * candidate state per batch. */
  private def capLocal(df: DataFrame, cap: Int): (DataFrame, Boolean, Long) = {
    // pin FIRST, probe the pinned frame (DecontamView.capLocal's fix):
    // the probe's partial scan materializes checkpoint blocks the
    // over-cap branch then reuses, instead of recomputing the frame.
    // Under the cap the LocalRelation replaces the pin; the
    // ContextCleaner reaps the tiny blocks when the frame drops.
    // The third slot is the EXACT row count when local (free — the rows
    // are already collected) and Long.MaxValue when over-cap: the
    // relabel-width derivation reads it, and MaxValue resolves to the
    // deployment-width cap (the safe width for an uncut corpus-sized
    // bootstrap batch).
    val pinned = df.localCheckpoint(false)
    val rows = pinned.limit(cap + 1).collect().toSeq
    if (rows.size > cap) (pinned, false, Long.MaxValue)
    else (df.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, df.schema),
      true, rows.size.toLong)
  }

  /** Per-batch relabel width: explicit `requested > 0` pins it; the 0
    * sentinel derives the width from the affected subgraph's node count
    * ([[Dedup.ccWidthCapped]], floor 8) capped at the DEPLOYMENT's
    * `defaultParallelism` — NOT the replay child session's deliberately
    * narrow batch width, which would neuter the widening exactly when
    * it matters (an uncut corpus-sized bootstrap/catch-up batch whose
    * affected subgraph IS the corpus). */
  private[graft] def relabelWidth(requested: Int, affectedNodes: Long,
                                  s: org.apache.spark.sql.SparkSession): Int =
    if (requested > 0) requested
    else Dedup.ccWidthCapped(affectedNodes, s.sparkContext.defaultParallelism)

  private def hintIf(df: DataFrame, isLocal: Boolean): DataFrame =
    if (isLocal) broadcast(df) else df

  /** Row count of a projection over a LocalRelation, read off the plan —
    * zero jobs (the bootstrap branches derive the relabel width from the
    * batch's already-collected key set). None when the plan is not a
    * pure projection chain over a LocalRelation. */
  private def localPlanSize(df: DataFrame): Option[Long] = {
    def walk(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Option[Long] = p match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        Some(l.data.size.toLong)
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
        walk(pr.child)
      case _ => None
    }
    walk(df.queryExecution.analyzed)
  }

  /** Byte budget for the explicit |Δ|-side PAYLOAD broadcast in
    * [[maintainerFromEdgesCounted]]: 64 MB — well past the planner's
    * 10 MB default (the explicit hint exists because size estimates
    * over unpinned subtrees are too fuzzy to trust), far under the
    * GB-scale that `maxLocalKeys` rows of wide embedding vectors could
    * route through the driver. Key-only broadcasts (a few dozen bytes
    * per row) stay gated on `ckLocal` alone. */
  private[graft] val MaxBroadcastPayloadBytes: Long = 64L << 20

  /** The exact-cosine modality: edges between live vectors with
    * `cosine >= minCosine`. Oracle-expressible end-to-end (DuckDB
    * `list_cosine_similarity` + recursive min-label reach), which is the
    * point of keeping an exact variant next to the LSH index. Its
    * per-batch probe is |Δ| × |live| BY DESIGN, so it carries the
    * [[Dedup.requireAllPairsBound]] loudness: a live corpus past
    * `maxLiveRows` fails naming the maintained-LSH swap
    * ([[semanticMaintainer]] / [[overIndex]]) instead of silently
    * burning n² cosine evaluations per batch.
    *
    * OWNERSHIP: each returned maintainer instance carries its own
    * amortized live-count tracker, so one instance must fold exactly
    * ONE replay/stream at a time — sharing an instance across
    * concurrently running replays can interleave the tracker's updates
    * and under-estimate the live count, silently bypassing the
    * `maxLiveRows` refusal (output correctness is unaffected; the O(n²)
    * loudness guard is what degrades). Build a fresh instance per
    * replay — which [[graft.cdc.TableViews.replay]]'s distinct-instance
    * requirement already pushes callers toward. */
  def cosineMaintainer(idCol: String, vecCol: String, minCosine: Double,
                       ccShufflePartitions: Int = 0,
                       maxLiveRows: Long = 65536,
                       ccLocalEdgeCap: Int = Dedup.LocalCcMaxEdges)
      : TableViews.Maintainer[ClusterState] = {
    // AMORTIZED loudness bound (no per-batch corpus pass): the live
    // corpus is counted once on the maintainer's first batch; the bound
    // then advances optimistically by each batch's changed-key count
    // (free — the replay's |Δ|-capped LocalRelation) and a full recount
    // happens only when the optimistic upper bound crosses maxLiveRows
    // (deletes may keep the true count below it). The tracker only ever
    // OVER-estimates, so crossing triggers a recount, never a silent
    // pass. NOTE maxLiveRows=65536 is a behavior contract: a replay
    // whose live corpus exceeds it refuses loudly naming the LSH swap —
    // callers with a genuinely larger exact-modality corpus must raise
    // the bound explicitly.
    val liveUpper = new java.util.concurrent.atomic.AtomicLong(-1L)
    maintainerFromEdgesCounted(idCol, (changedLive, liveAll, deltaCount) => {
      val prev = liveUpper.get
      val d = if (prev < 0) Long.MaxValue else deltaCount()
      val optimistic =
        if (prev < 0 || d == Long.MaxValue || prev + d > maxLiveRows)
          liveAll.count()
        else prev + d
      require(optimistic <= maxLiveRows,
        s"ClusterView.cosineMaintainer (exact-cosine edge probe): exact " +
          s"all-pairs kernel over $optimistic live rows (> $maxLiveRows) " +
          "— O(n²) candidate pairs do not scale; use the LSH-bucketed " +
          "path (ClusterView.semanticMaintainer or ClusterView.overIndex) " +
          "instead, or raise maxLiveRows explicitly")
      liveUpper.set(optimistic)
      // NOTE on the |Δ| × live probe's shape: a disjoint-halves split
      // (changed × unchanged, plus changed × changed under id_a <
      // id_b) was measured at sf0.1 and REJECTED — the stage is bound
      // by nested-loop pair ENUMERATION, which the split cannot reduce
      // (the predicate is checked per enumerated pair either way), not
      // by cosine evaluations, so it only added two extra joins.
      // norms hoisted to per-row columns: the enumerated-pair filter
      // evaluates ONE dot kernel instead of three (bit-identical — see
      // VectorFunctions.cosineHoisted)
      val vf = graft.functions.VectorFunctions
      val a = changedLive.select(col(idCol).cast("long").as("id_a"),
                                 col(vecCol).cast("array<double>").as("va"))
        .withColumn("na", vf.norm2(col("va")))
      val b = liveAll.select(col(idCol).cast("long").as("id_b"),
                             col(vecCol).cast("array<double>").as("vb"))
        .withColumn("nb", vf.norm2(col("vb")))
      a.join(b, col("id_a") =!= col("id_b"))
        .filter(vf.cosineHoisted(col("va"), col("vb"),
                                 col("na"), col("nb")) >= minCosine)
        .select(least(col("id_a"), col("id_b")).as("src"),
                greatest(col("id_a"), col("id_b")).as("dst"))
        .distinct()
    }, ccShufflePartitions, ccLocalEdgeCap)
  }

  /** [[overIndex]] state: the inner band index plus the cluster
    * assignment. [[graft.cdc.MultiView.PinnedExtras]] so release paths
    * reach the nested index frames (tuple walking is one level deep). */
  final case class IndexedClusterState(
      index: DedupIndexView.IndexState, clusters: DataFrame)
      extends graft.cdc.MultiView.PinnedExtras {
    def pinnedExtras: Seq[DataFrame] =
      graft.cdc.MultiView.stateFrames(index)
  }

  def view(st: IndexedClusterState): DataFrame =
    st.clusters.select(col("id"), col("cluster"),
                       (col("cluster") === col("id")).as("is_rep"))

  /** Clusters over a MAINTAINED band index ([[DedupIndexView]]) — the
    * corpus-scale path: the index's PATCH-TIME-VERIFIED pair scores ARE
    * the edge set (edges = scores ≥ `minEdgeScore`), so edge upkeep is
    * the index's own |Δ|-bounded patch + verify and no per-batch corpus
    * probe exists at all — the relabel reads maintained scores instead
    * of re-joining live vectors. Candidate-graph changes are exactly
    * the TOUCHED buckets (a changed id's old ∪ new bands — a pair lives
    * only in its endpoints' buckets, so a vector change can never alter
    * an untouched bucket's pairs): their old/new pairs' endpoints seed
    * the affected components, and the relabel runs over the post-patch
    * verified edges restricted to the affected vertices. Seeding from
    * CANDIDATES (a superset of true edges) is correct — extra seeds
    * only widen the relabel, never change labels.
    *
    * `ccShufflePartitions` sizes the relabel CC's per-round exchanges.
    * The default 0 DERIVES the width per batch from the affected
    * subgraph's node count ([[relabelWidth]]): steady |Δ|-bounded
    * batches resolve to the narrow floor (8 — per-task constants
    * dominate tiny rounds), while an uncut corpus-sized
    * bootstrap/catch-up batch (affected subgraph over the collect cap)
    * fans the relabel out to the deployment's parallelism instead of
    * funneling the whole candidate graph through a fixed handful of
    * reducers. An explicit positive value pins the width. */
  def overIndex(idCol: String,
                inner: TableViews.Maintainer[DedupIndexView.IndexState],
                minEdgeScore: Double,
                ccShufflePartitions: Int = 0,
                ccLocalEdgeCap: Int = Dedup.LocalCcMaxEdges)
      : TableViews.Maintainer[IndexedClusterState] =
    new TableViews.Maintainer[IndexedClusterState] {
      private val clusterSchema = StructType(Seq(
        StructField("id", LongType), StructField("cluster", LongType)))

      def empty(events0: DataFrame, pk: Seq[String]): IndexedClusterState =
        IndexedClusterState(inner.empty(events0, pk),
          events0.sparkSession.createDataFrame(
            events0.sparkSession.sparkContext
              .emptyRDD[org.apache.spark.sql.Row], clusterSchema))

      def step(st: IndexedClusterState, ctx: TableViews.BatchCtx)
          : IndexedClusterState = {
        val idx2 = inner.step(st.index, ctx)
        val ck = ctx.changedKeys.getOrElse(
            ctx.delta.select(col(s"after.$idCol").as(idCol)).distinct())
          .select(col(idCol).cast("long").as("id"))
        def hinted(df: DataFrame): DataFrame =
          if (ctx.ckLocal) broadcast(df) else df
        val postLive = Materializer.liveView(ctx.postState)
        val liveIds = postLive.select(col(idCol).cast("long").as("id"))
        // FROM-EMPTY (bootstrap) fold: the post-state was built from this
        // batch alone, so every pair endpoint IS a changed id — seeds =
        // ck, no component exists to carry over, and the affected verts
        // are exactly ck. The three seed/affected capLocal pin+collect
        // pairs and the touched-bucket pin are no-ops from empty;
        // skipping them removes ~7 driver jobs from the one-shot batch
        // (bridge.staticallyEmpty contract: plan-only, never semantics).
        val bbr = org.apache.spark.sql.graft.bridge
        if (bbr.staticallyEmpty(st.clusters) &&
            bbr.staticallyEmpty(st.index.index) &&
            bbr.staticallyEmpty(st.index.byBucket)) {
          val avN =
            if (ctx.ckLocal) localPlanSize(ck).getOrElse(Long.MaxValue)
            else Long.MaxValue
          val (subEdges, seL, _) = capLocal(idx2.scores
            .filter(col("score") >= minEdgeScore)
            .select(col("id_a").cast("long").as("src"),
                    col("id_b").cast("long").as("dst")), ctx.maxLocalKeys)
          val cc =
            if (seL && subEdges.isEmpty)
              ctx.delta.sparkSession.createDataFrame(
                ctx.delta.sparkSession.sparkContext
                  .emptyRDD[org.apache.spark.sql.Row], clusterSchema)
            else Dedup.connectedComponentsLogStar(subEdges, "src", "dst",
                shufflePartitions = relabelWidth(ccShufflePartitions, avN,
                                                 ctx.delta.sparkSession),
                localEdgeCap = ccLocalEdgeCap)
              .select(col("id"), col("component").as("cluster"))
          val singletons = ck
            .join(cc.select(col("id")), Seq("id"), "left_anti")
            .select(col("id"), col("id").as("cluster"))
          val (deleted, delL, _) = capLocal(
            ck.join(liveIds.join(hinted(ck), Seq("id"), "left_semi"),
                    Seq("id"), "left_anti"), ctx.maxLocalKeys)
          return IndexedClusterState(idx2,
            cc.unionByName(singletons)
              .join(hintIf(deleted, delL), Seq("id"), "left_anti"))
        }
        // touched buckets = changed ids' old ∪ new bands; their old/new
        // pairs bound every candidate-graph change this batch
        def bandsOf(index: DataFrame): DataFrame = index
          .join(hinted(ck.select(col("id").cast(
                  index.schema("id").dataType).as("id"))),
                Seq("id"), "left_semi")
          .select(col("band"), col("bandHash"))
        val touched = bandsOf(st.index.index)
          .unionByName(bandsOf(idx2.index))
          .distinct().localCheckpoint(false)
        def pairsIn(byBucket: DataFrame): DataFrame = byBucket
          .join(hinted(touched), Seq("band", "bandHash"), "left_semi")
          .select(col("id_a").cast("long").as("id_a"),
                  col("id_b").cast("long").as("id_b"))
        def endpoints(p: DataFrame): DataFrame =
          p.select(col("id_a").as("id"))
            .unionByName(p.select(col("id_b").as("id")))
        // the derived key frames collect-cap to broadcast LocalRelations
        // (capLocal): the candidate state and the cluster assignment are
        // then pruned scan-side, never shuffled whole per batch
        val (seeds, seedsL, _) = capLocal(ck
          .unionByName(endpoints(pairsIn(st.index.byBucket)))
          .unionByName(endpoints(pairsIn(idx2.byBucket)))
          .distinct(), ctx.maxLocalKeys)
        val (affectedComps, acL, _) = capLocal(
          st.clusters.join(hintIf(seeds, seedsL), Seq("id"), "left_semi")
            .select(col("cluster")).distinct(), ctx.maxLocalKeys)
        val (affectedVerts, avL, avN) = capLocal(st.clusters
          .join(hintIf(affectedComps, acL), Seq("cluster"), "left_semi")
          .select(col("id"))
          .unionByName(ck).distinct(), ctx.maxLocalKeys)
        // relabel over the post-patch VERIFIED edges of the affected
        // verts — a read of the index's maintained pair scores (no
        // vector re-join; verification already happened at patch time),
        // pruned scan-side by the (capped) affected-vert set (component
        // closure: a verified edge never crosses untouched components)
        val (subEdges, seL, _) = capLocal(idx2.scores
          .filter(col("score") >= minEdgeScore)
          .select(col("id_a").cast("long").as("src"),
                  col("id_b").cast("long").as("dst"))
          .join(hintIf(affectedVerts.select(col("id").as("src")), avL),
                Seq("src"), "left_semi"), ctx.maxLocalKeys)
        // log-star CC: a maintained view cannot assume its affected
        // subgraph is shallow (adversarial near-dup ladders chain), and
        // the O(log n)-round variant costs the same per-round shape.
        // SHORT-CIRCUIT an edgeless relabel (steady-state batches whose
        // changed ids touch nothing similar): the collected edge set's
        // emptiness is a free driver-side check, and skipping the CC
        // loop skips its child session + pin + per-round jobs entirely
        val cc =
          if (seL && subEdges.isEmpty)
            ctx.delta.sparkSession.createDataFrame(
              ctx.delta.sparkSession.sparkContext
                .emptyRDD[org.apache.spark.sql.Row], clusterSchema)
          else Dedup.connectedComponentsLogStar(subEdges, "src", "dst",
              shufflePartitions = relabelWidth(ccShufflePartitions, avN,
                                               ctx.delta.sparkSession),
              localEdgeCap = ccLocalEdgeCap)
            .select(col("id"), col("component").as("cluster"))
        val singletons = affectedVerts
          .join(cc.select(col("id")), Seq("id"), "left_anti")
          .select(col("id"), col("id").as("cluster"))
        // live restrict via the |Δ|-bounded DELETED set: the assignment
        // invariantly holds only live ids, so the relabel set's only
        // possible dead ids are the ones deleted THIS batch — a semi
        // against the corpus-sized live id set would shuffle the corpus
        // per batch (the stress probe's exactly-|live| stage)
        val (deleted, delL, _) = capLocal(
          ck.join(liveIds.join(hinted(ck), Seq("id"), "left_semi"),
                  Seq("id"), "left_anti"), ctx.maxLocalKeys)
        val relabeled = cc.unionByName(singletons)
          .join(hintIf(deleted, delL), Seq("id"), "left_anti")
        IndexedClusterState(idx2,
          st.clusters
            .join(hintIf(affectedComps, acL), Seq("cluster"), "left_anti")
            .select(col("id"), col("cluster"))
            .unionByName(relabeled))
      }

      def pin(st: IndexedClusterState): IndexedClusterState =
        IndexedClusterState(inner.pin(st.index),
                            st.clusters.localCheckpoint(false))
      def reRoot(st: IndexedClusterState,
                 to: org.apache.spark.sql.SparkSession)
          : IndexedClusterState =
        IndexedClusterState(inner.reRoot(st.index, to),
          org.apache.spark.sql.graft.bridge.reRoot(st.clusters, to))
    }

  /** The embedding (random-hyperplane LSH) instantiation of
    * [[overIndex]]: [[DedupIndexView.embeddingMaintainer]] keeps the
    * bucket index and verifies candidates by exact cosine AT PATCH
    * TIME; edges are the maintained scores ≥ `minCosine`. One
    * maintained state serves BOTH the near-dup pair face (via
    * `.index.scores`) and the cluster face. */
  def semanticMaintainer(idCol: String, vecCol: String, dim: Int,
                         minCosine: Double, tables: Int = 8,
                         planes: Int = 12, maxBucket: Int = 1000,
                         ccShufflePartitions: Int = 0,
                         ccLocalEdgeCap: Int = Dedup.LocalCcMaxEdges)
      : TableViews.Maintainer[IndexedClusterState] =
    overIndex(idCol,
      DedupIndexView.embeddingMaintainer(idCol, vecCol, dim, tables,
                                         planes, maxBucket = maxBucket),
      minEdgeScore = minCosine, ccShufflePartitions, ccLocalEdgeCap)

  /** The generic maintainer. `edgesFor(changedLive, liveAll)` returns
    * the canonical `(src, dst)` LONG edges incident to the changed live
    * rows (both orientations' duplicates already collapsed); the first
    * argument is |Δ|-bounded by construction, so any prober — exact
    * scan, LSH buckets, an ANN probe — plugs in without touching the
    * component algebra. `idCol` must be the table's single-column
    * integral primary key. */
  def maintainerFromEdges(idCol: String,
                          edgesFor: (DataFrame, DataFrame) => DataFrame,
                          ccShufflePartitions: Int = 0,
                          ccLocalEdgeCap: Int = Dedup.LocalCcMaxEdges)
      : TableViews.Maintainer[ClusterState] =
    maintainerFromEdgesCounted(idCol,
      (changed, live, _) => edgesFor(changed, live), ccShufflePartitions,
      ccLocalEdgeCap)

  /** [[maintainerFromEdges]] whose prober also receives a CHEAP
    * changed-key-count thunk: when the batch's changed keys stayed
    * under the |Δ| collect cap (the common case) the count is a
    * driver-local fold over the already-collected LocalRelation;
    * over-cap batches return Long.MaxValue so bound trackers
    * (cosineMaintainer's amortized corpus bound) fall back to a real
    * count instead of trusting a number that was never collected. */
  def maintainerFromEdgesCounted(
      idCol: String,
      edgesFor: (DataFrame, DataFrame, () => Long) => DataFrame,
      ccShufflePartitions: Int = 0,
      ccLocalEdgeCap: Int = Dedup.LocalCcMaxEdges)
      : TableViews.Maintainer[ClusterState] =
    new TableViews.Maintainer[ClusterState] {
      private val edgeSchema = StructType(Seq(
        StructField("src", LongType), StructField("dst", LongType)))
      private val clusterSchema = StructType(Seq(
        StructField("id", LongType), StructField("cluster", LongType)))

      // Measured-once average payload row bytes (vector/text widths are
      // schema-stable across a corpus): the explicit |Δ|-side broadcast
      // below is gated on BYTES, not key count — ckLocal bounds ROWS
      // (<= maxLocalKeys), but the probe side carries FULL live rows
      // including embedding vectors, and at the cap with wide vectors a
      // row-count gate alone pushes GBs through the driver. The sample
      // is one 4-row collect on the first non-empty batch.
      private val avgRowBytes =
        new java.util.concurrent.atomic.AtomicLong(-1L)
      private def payloadRowBytes(live: DataFrame): Long = {
        if (avgRowBytes.get < 0) {
          val sample = live.limit(4).collect()
          if (sample.nonEmpty)
            avgRowBytes.compareAndSet(-1L, math.max(64L,
              org.apache.spark.util.SizeEstimator.estimate(
                sample.asInstanceOf[AnyRef]) / sample.length))
        }
        math.max(64L, avgRowBytes.get)
      }

      def empty(events0: DataFrame, pk: Seq[String]): ClusterState = {
        require(pk == Seq(idCol),
          s"cluster view requires pk == Seq($idCol), got $pk")
        val spark = events0.sparkSession
        def emptyDf(schema: StructType) = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        ClusterState(emptyDf(edgeSchema), emptyDf(clusterSchema))
      }

      def step(st: ClusterState, ctx: TableViews.BatchCtx): ClusterState = {
        val ck = ctx.changedKeys.getOrElse(
            ctx.delta.select(col(s"after.$idCol").as(idCol)).distinct())
          .select(col(idCol).cast("long").as("id"))
        def hinted(df: DataFrame): DataFrame =
          if (ctx.ckLocal) broadcast(df) else df
        val postLive = Materializer.liveView(ctx.postState)
        val liveIds = postLive.select(col(idCol).cast("long").as("id"))
        val changedLive = postLive
          .join(hinted(ck.select(col("id").cast(
                  postLive.schema(idCol).dataType).as(idCol))),
                Seq(idCol), "left_semi")
        // 1. edge upkeep: drop everything incident to a changed id,
        // re-probe the changed ids' edges against the post-merge corpus.
        // PINNED: newEdges feeds the edge state AND the affected-seed
        // set — without the pin the |Δ| × live probe (the expensive
        // per-batch work) would run once per consuming subtree.
        val ckSrc = hinted(ck.select(col("id").as("src")))
        val ckDst = hinted(ck.select(col("id").as("dst")))
        val dropped = st.edges.join(ckSrc, Seq("src"), "left_semi")
          .unionByName(st.edges.join(ckSrc, Seq("src"), "left_anti")
            .join(ckDst, Seq("dst"), "left_semi")
            .select(col("src"), col("dst")))
        val kept = st.edges.join(ckSrc, Seq("src"), "left_anti")
          .join(ckDst, Seq("dst"), "left_anti")
          .select(col("src"), col("dst"))
        // under the cap ck is a projection over the collected
        // LocalRelation, so its size reads off the plan — zero jobs
        val deltaCount: () => Long =
          () => if (ctx.ckLocal)
                  localPlanSize(ck).getOrElse(ck.count())
                else Long.MaxValue
        // the changed side is |Δ|-bounded whenever the batch's keys
        // collected under the cap — say so explicitly: the probe's
        // pair join must build on the |Δ| side and stream the corpus,
        // and the planner's size estimates over these unpinned
        // subtrees are too fuzzy to rely on (a projection as small as
        // a hoisted norm column has been seen to flip the build side).
        // The hint is additionally gated on an estimated BYTE budget
        // (|Δ| keys × measured payload row width): a capped key set
        // carrying wide vectors can still be GB-scale, and an over-
        // budget batch falls back to the unhinted plan rather than
        // routing that through the driver.
        val bcastDelta = ctx.ckLocal &&
          deltaCount() * payloadRowBytes(postLive) <=
            MaxBroadcastPayloadBytes
        // FROM-EMPTY (bootstrap) fold: no prior edge or cluster exists,
        // so kept/dropped are empty, the edge state IS the fresh probe's
        // output, every endpoint is a changed id (seeds = ck, affected
        // verts = ck) and nothing carries over. One capLocal pin+probe
        // replaces the two eager edge pins and the three seed/affected
        // capLocal chains (bridge.staticallyEmpty contract: plan-only).
        val bbr = org.apache.spark.sql.graft.bridge
        if (bbr.staticallyEmpty(st.edges) && bbr.staticallyEmpty(st.clusters)) {
          val avN0 =
            if (ctx.ckLocal) localPlanSize(ck).getOrElse(Long.MaxValue)
            else Long.MaxValue
          val (subEdges, seL, _) = capLocal(
            edgesFor(if (bcastDelta) broadcast(changedLive) else changedLive,
                     postLive, deltaCount), ctx.maxLocalKeys)
          val cc =
            if (seL && subEdges.isEmpty)
              ctx.delta.sparkSession.createDataFrame(
                ctx.delta.sparkSession.sparkContext
                  .emptyRDD[org.apache.spark.sql.Row], clusterSchema)
            else Dedup.connectedComponentsLogStar(subEdges, "src", "dst",
                shufflePartitions = relabelWidth(ccShufflePartitions, avN0,
                                                 ctx.delta.sparkSession),
                localEdgeCap = ccLocalEdgeCap)
              .select(col("id"), col("component").as("cluster"))
          val singletons = ck
            .join(cc.select(col("id")), Seq("id"), "left_anti")
            .select(col("id"), col("id").as("cluster"))
          val (deleted, delL, _) = capLocal(
            ck.join(liveIds.join(hinted(ck.select(col("id"))), Seq("id"),
                                 "left_semi"),
                    Seq("id"), "left_anti"), ctx.maxLocalKeys)
          return ClusterState(subEdges,
            cc.unionByName(singletons)
              .join(hintIf(deleted, delL), Seq("id"), "left_anti"))
        }
        val newEdges =
          edgesFor(if (bcastDelta) broadcast(changedLive) else changedLive,
                   postLive, deltaCount).localCheckpoint(false)
        val edges1 = kept.unionByName(newEdges).localCheckpoint(false)
        // 2. affected components: owners of a changed id or of any
        // endpoint whose incident edge set changed. Everything else
        // carries over without relabeling.
        def endpoints(e: DataFrame): DataFrame =
          e.select(col("src").as("id"))
            .unionByName(e.select(col("dst").as("id")))
        // collect-capped to broadcast LocalRelations (capLocal): the
        // edge state and the assignment are pruned scan-side per batch,
        // never shuffled whole
        val (seeds, seedsL, _) = capLocal(ck.unionByName(endpoints(dropped))
          .unionByName(endpoints(newEdges)).distinct(), ctx.maxLocalKeys)
        val (affectedComps, acL, _) = capLocal(st.clusters
          .join(hintIf(seeds, seedsL), Seq("id"), "left_semi")
          .select(col("cluster")).distinct(), ctx.maxLocalKeys)
        val (affectedVerts, avL, avN) = capLocal(st.clusters
          .join(hintIf(affectedComps, acL), Seq("cluster"), "left_semi")
          .select(col("id"))
          .unionByName(ck).distinct(), ctx.maxLocalKeys)
        // 3. component-local relabel: CC over the affected induced
        // subgraph (src-side restrict suffices — old edges never cross
        // components, new edges' endpoints are both affected), singleton
        // fill, live restrict (deleted ids leave no row).
        val (subEdges, seL, _) = capLocal(edges1.join(
          hintIf(affectedVerts.select(col("id").as("src")), avL),
          Seq("src"), "left_semi"), ctx.maxLocalKeys)
        // log-star CC with the edgeless short-circuit (see overIndex)
        val cc =
          if (seL && subEdges.isEmpty)
            ctx.delta.sparkSession.createDataFrame(
              ctx.delta.sparkSession.sparkContext
                .emptyRDD[org.apache.spark.sql.Row], clusterSchema)
          else Dedup.connectedComponentsLogStar(subEdges, "src", "dst",
              shufflePartitions = relabelWidth(ccShufflePartitions, avN,
                                               ctx.delta.sparkSession),
              localEdgeCap = ccLocalEdgeCap)
            .select(col("id"), col("component").as("cluster"))
        val singletons = affectedVerts
          .join(cc.select(col("id")), Seq("id"), "left_anti")
          .select(col("id"), col("id").as("cluster"))
        // live restrict via the |Δ|-bounded deleted set (see overIndex:
        // the assignment invariantly holds live ids, so a semi against
        // the corpus-sized live id set would shuffle the corpus)
        val (deleted, delL, _) = capLocal(
          ck.join(liveIds.join(hinted(ck.select(col("id"))), Seq("id"),
                               "left_semi"),
                  Seq("id"), "left_anti"), ctx.maxLocalKeys)
        val relabeled = cc.unionByName(singletons)
          .join(hintIf(deleted, delL), Seq("id"), "left_anti")
        ClusterState(edges1,
          st.clusters
            .join(hintIf(affectedComps, acL), Seq("cluster"), "left_anti")
            .select(col("id"), col("cluster"))
            .unionByName(relabeled))
      }

      def pin(st: ClusterState): ClusterState =
        // edges are pinned in step (they seed the next batch's drop set
        // AND this batch's subgraph); the clusters frame pins here
        ClusterState(st.edges, st.clusters.localCheckpoint(false))
      def reRoot(st: ClusterState, to: org.apache.spark.sql.SparkSession)
          : ClusterState = {
        val b = org.apache.spark.sql.graft.bridge
        ClusterState(b.reRoot(st.edges, to), b.reRoot(st.clusters, to))
      }
    }
}
