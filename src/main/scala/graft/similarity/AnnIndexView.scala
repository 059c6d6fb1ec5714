package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{Materializer, TableViews}

/** INCREMENTALLY MAINTAINED IVF (inverted-file) ANN index over a
  * vector-corpus changelog — the similarity-search sibling of
  * [[graft.dedup.DedupIndexView]]: a 100 TB embedding store is not
  * re-assigned per re-embedding pass; the coarse quantizer is trained
  * ONCE and the inverted lists are a live view over the corpus topic.
  *
  * Per batch, only the CHANGED vectors are re-assigned (a |Δ|×C
  * broadcast nearest-centroid pass — [[Similarity.ivfAssign]]'s min_by
  * shape over the delta instead of the corpus); the maintained
  * assignment table is patched via changed-key anti joins and equals a
  * from-scratch `ivfAssign(liveCorpus)` after every batch (spec'd).
  * Probes serve straight off the maintained table with
  * [[Similarity.ivfTopK]].
  *
  * The quantizer is passed as LOCAL centroid rows (C-bounded — the
  * product of a one-time [[Similarity.kmeansCentroids]] run or any
  * externally trained codebook): each batch rebuilds the tiny broadcast
  * frame in the replay's own session, so the maintainer never captures a
  * foreign session's plan. */
object AnnIndexView {

  /** The local codebook as a tiny session-rooted frame (C-bounded;
    * rebuilt per use so no foreign session's plan is captured). */
  private[graft] def centroidDf(s: SparkSession,
                                centroids: Seq[(Long, Seq[Float])])
      : DataFrame =
    s.createDataFrame(centroids).toDF("vec_id", "embedding")
      .select(col("vec_id"),
              col("embedding").cast("array<float>").as("embedding"))

  /** Scan-side nearest-centroid struct `(d, cid)` over a LOCAL codebook
    * — min L2 distance then centroid id (the same tie-break as
    * [[Similarity.ivfAssign]]'s min_by ordering), as ONE Column
    * expression. This is what makes assignment a pure function of the
    * vector that [[TableViews.withDerived]] can plant into change
    * events — the drift stat then rides the ordinary moments
    * maintainer, |Δ| rows evaluated per batch, never the corpus.
    * Implemented as the custom [[graft.functions.NearestCentroid]]
    * kernel (codebook as a codegen reference object, constant code
    * size): the composed `array_min(array(struct(l2, id)...))` form
    * inlines C kernels into the stage and crossed Janino's 64 KB
    * method limit at C = 100, silently dropping the whole stage to
    * interpreted evaluation. */
  private[graft] def bestCentroid(vec: org.apache.spark.sql.Column,
                                  centroids: Seq[(Long, Seq[Float])])
      : org.apache.spark.sql.Column =
    graft.functions.VecDot.nearest_centroid(vec,
      centroids.map(_._1).toArray,
      centroids.map(_._2.toArray).toArray)

  /** QUANTIZER-STALENESS MONITOR: the per-centroid moments
    * (n, Σd, Σd²) of each live vector's distance to its assigned (=
    * nearest) centroid, maintained from the changelog's deltas alone —
    * the drift signal for a frozen coarse quantizer over a churning
    * corpus. Recall degrades SILENTLY as vectors walk away from the
    * codebook (probes still return k rows, just from the wrong lists);
    * rising mean/variance of assignment distance is the observable
    * symptom, and maintaining it costs |Δ| scan-side kernel
    * evaluations per batch riding the existing moments algebra.
    * Distances are rounded to 6 decimals and summed as DECIMAL(18,6),
    * so the face is exact decimal arithmetic (and DuckDB-checkable);
    * retraction under re-embeds/deletes is exact because the derived
    * columns are pure functions of the vector payload
    * ([[TableViews.withDerived]]'s partial-`old` resolution). When the
    * face trips a deployment's threshold, [[retrain]] is the refresh
    * path. */
  def driftMaintainer(idCol: String, vecCol: String,
                      centroids: Seq[(Long, Seq[Float])])
      : TableViews.Maintainer[DataFrame] = {
    require(centroids.nonEmpty, "at least one centroid")
    val plant: DataFrame => DataFrame = ev =>
      TableViews.withDerived(vecCol, "assign_dist")(v =>
        round(bestCentroid(v, centroids).getField("d"), 6))(
        TableViews.withDerived(vecCol, "centroid_id")(v =>
          bestCentroid(v, centroids).getField("cid"))(ev))
    TableViews.mapDelta(
      graft.cdc.IncrementalAgg.momentsMaintainer(
        "centroid_id", "assign_dist", _.cast("decimal(18,6)")))(plant)
  }

  /** The drift FACE over a maintained [[driftMaintainer]] state: per
    * centroid, live vector count and the mean/variance of
    * assignment distance — pure arithmetic over the maintained
    * moments, |C| rows. */
  def driftView(moments: DataFrame): DataFrame = {
    val mean = col("sum_assign_dist").cast("double") / col("n_rows")
    graft.cdc.IncrementalAgg.momentsView(moments)
      .select(col("centroid_id"), col("n_rows").as("n_vecs"),
              round(mean, 6).as("avg_dist"),
              round(col("sumsq_assign_dist").cast("double") / col("n_rows")
                      - mean * mean, 6).as("var_dist"))
  }

  /** RETRAIN-AND-SWAP, the refresh path the drift face calls for:
    * train a FRESH coarse quantizer on the current live corpus
    * ([[Similarity.kmeansCentroids]] — one broadcast + one map-side-
    * partial pass per Lloyd iteration) and rebuild the assignment
    * table in one corpus pass ([[Similarity.ivfAssign]]). Returns the
    * new local codebook plus the rebuilt assignment state — the seed
    * for a fresh [[maintainer]]`(idCol, vecCol, newCodebook)` going
    * forward. Persisted deployments write the rebuilt (assignment,
    * face) as ONE new generation through the same atomic-swap seam
    * every maintained face uses
    * ([[graft.streaming.CdcStream.swapGeneration]]): readers keep the
    * old index until the promote, a crash leaves the old generation
    * live, and the demoted generation stays readable — retraining is
    * just another state write. */
  def retrain(live: DataFrame, idCol: String, vecCol: String, k: Int,
              seed: Long = 42L, maxIter: Int = 10)
      : (Seq[(Long, Seq[Float])], DataFrame) = {
    val corpus = live.select(col(idCol).as("vec_id"),
                             col(vecCol).as("embedding"))
    val codebook = localCentroids(
      Similarity.kmeansCentroids(corpus, k, maxIter, seed))
    val assigned = Similarity.ivfAssign(
      corpus, centroidDf(live.sparkSession, codebook))
    (codebook, assigned)
  }

  /** The maintained IVF assignment table
    * `(vec_id, embedding, centroid_id)` as a
    * [[TableViews.Maintainer]]. `idCol`/`vecCol` name the changelog's
    * key and vector columns; state columns are canonical
    * (`vec_id`, `embedding`, `centroid_id`) regardless. */
  def maintainer(idCol: String, vecCol: String,
                 centroids: Seq[(Long, Seq[Float])])
      : TableViews.Maintainer[DataFrame] =
    new TableViews.Maintainer[DataFrame] {
      require(centroids.nonEmpty, "at least one centroid")

      private def centroidDf(s: SparkSession): DataFrame =
        AnnIndexView.centroidDf(s, centroids)

      def empty(events0: DataFrame, pk: Seq[String]): DataFrame = {
        require(pk == Seq(idCol),
          s"ANN index requires pk == Seq($idCol), got $pk")
        val spark = events0.sparkSession
        val idT = events0.select(col(s"after.$idCol")).schema.head.dataType
        val vecT = events0.select(col(s"after.$vecCol")).schema.head.dataType
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("vec_id", idT),
            org.apache.spark.sql.types.StructField("embedding", vecT),
            org.apache.spark.sql.types.StructField("centroid_id",
              org.apache.spark.sql.types.LongType))))
      }

      def step(st: DataFrame, ctx: TableViews.BatchCtx): DataFrame = {
        val ck = ctx.changedKeys.getOrElse(
            ctx.delta.select(col(s"after.$idCol").as(idCol)).distinct())
          .select(col(idCol).as("vec_id"))
        def hinted(df: DataFrame): DataFrame =
          if (ctx.ckLocal) broadcast(df) else df
        val changedLive = Materializer.liveView(ctx.postState)
          .join(hinted(ck.select(col("vec_id").as(idCol))), Seq(idCol),
                "left_semi")
          .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
        val assigned = Similarity.ivfAssign(
          changedLive, centroidDf(ctx.delta.sparkSession))
        // FROM-EMPTY (bootstrap) fold: nothing to patch — the assignment
        // IS the delta's (bridge.staticallyEmpty contract: plan-only)
        if (org.apache.spark.sql.graft.bridge.staticallyEmpty(st))
          assigned.select(col("vec_id"), col("embedding"),
                          col("centroid_id"))
        else
          st.join(hinted(ck), Seq("vec_id"), "left_anti")
            .select(col("vec_id"), col("embedding"), col("centroid_id"))
            .unionByName(assigned
              .select(col("vec_id"), col("embedding"), col("centroid_id")))
      }

      def pin(st: DataFrame): DataFrame = st.localCheckpoint(false)
      def reRoot(st: DataFrame, to: SparkSession): DataFrame =
        org.apache.spark.sql.graft.bridge.reRoot(st, to)
    }

  /** A codebook-FOLLOWING view state: the maintained frame (`data` —
    * the IVF assignment table, or the drift moments) plus the codebook
    * it was built with, carried INSIDE the state so both always ride
    * the same atomic generation. This is what makes the automated
    * drift→retrain loop closeable mid-stream: [[graft.streaming
    * .CdcStream.retrainAnnIvf]] swaps (assignment, codebook, moments)
    * together, and the NEXT batch's restore reads its quantizer from
    * the generation — no constructor-captured centroids to go stale,
    * so the epoch-mixing hazard the fixed-codebook [[maintainer]]'s
    * restore refusal guards against cannot arise by construction. */
  final case class FollowState(data: DataFrame, codebook: DataFrame)

  /** Wrap a centroids-parameterized maintainer into its
    * codebook-following form: `initial` seeds the FIRST generation's
    * codebook; every later batch re-derives the quantizer from the
    * state's own codebook frame (one C-bounded collect per batch — the
    * same cost the fixed-codebook restore check already pays). */
  private def following(
      initial: Seq[(Long, Seq[Float])],
      innerFor: Seq[(Long, Seq[Float])] => TableViews.Maintainer[DataFrame])
      : TableViews.Maintainer[FollowState] =
    new TableViews.Maintainer[FollowState] {
      require(initial.nonEmpty, "at least one centroid")
      def empty(events0: DataFrame, pk: Seq[String]): FollowState =
        FollowState(innerFor(initial).empty(events0, pk),
                    centroidDf(events0.sparkSession, initial))
      def step(st: FollowState, ctx: TableViews.BatchCtx): FollowState = {
        val live = localCentroids(st.codebook)
        FollowState(innerFor(live).step(st.data, ctx), st.codebook)
      }
      def pin(st: FollowState): FollowState =
        FollowState(st.data.localCheckpoint(false),
                    st.codebook.localCheckpoint(false))
      def reRoot(st: FollowState, to: SparkSession): FollowState = {
        val b = org.apache.spark.sql.graft.bridge
        FollowState(b.reRoot(st.data, to), b.reRoot(st.codebook, to))
      }
    }

  /** [[maintainer]] in codebook-following form (state
    * [[FollowState]]). */
  def followingMaintainer(idCol: String, vecCol: String,
                          initial: Seq[(Long, Seq[Float])])
      : TableViews.Maintainer[FollowState] =
    following(initial, cs => maintainer(idCol, vecCol, cs))

  /** [[driftMaintainer]] in codebook-following form — the monitor
    * measures against the SAME generation-carried codebook the
    * assignment view assigns with, so the pair stays epoch-coherent
    * across an automated retrain with no restart. */
  def followingDriftMaintainer(idCol: String, vecCol: String,
                               initial: Seq[(Long, Seq[Float])])
      : TableViews.Maintainer[FollowState] =
    following(initial, cs => driftMaintainer(idCol, vecCol, cs))

  /** Collect a centroid DataFrame (e.g. [[Similarity.kmeansCentroids]]'s
    * output, or a deterministic corpus subset) into the local rows the
    * maintainer carries — CAPPED: a coarse quantizer is O(sqrt(corpus))
    * entries collected once at index build, and anything larger than
    * `maxCentroids` fails loudly rather than OOM the driver. */
  def localCentroids(centroids: DataFrame,
                     maxCentroids: Int = 65536): Seq[(Long, Seq[Float])] = {
    val rows = centroids.select(col("vec_id").cast("long"),
                                col("embedding").cast("array<float>"))
      .limit(maxCentroids + 1).collect()
    require(rows.length <= maxCentroids,
      s"localCentroids: more than $maxCentroids centroids — a coarse " +
        "quantizer this large should stay distributed")
    rows.map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
  }
}
