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
        s.createDataFrame(centroids).toDF("vec_id", "embedding")
          .select(col("vec_id"),
                  col("embedding").cast("array<float>").as("embedding"))

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
        st.join(hinted(ck), Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("embedding"), col("centroid_id"))
          .unionByName(assigned
            .select(col("vec_id"), col("embedding"), col("centroid_id")))
      }

      def pin(st: DataFrame): DataFrame = st.localCheckpoint(false)
      def reRoot(st: DataFrame, to: SparkSession): DataFrame =
        org.apache.spark.sql.graft.bridge.reRoot(st, to)
    }

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
