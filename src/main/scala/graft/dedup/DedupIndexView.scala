package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{Materializer, TableViews}

/** INCREMENTALLY MAINTAINED near-duplicate index — the marriage of the
  * engine's two halves: the CDC view-maintenance machinery
  * (reference shape: one decoded topic feeding N registered handlers,
  * `/root/reference/cdc_manager.go:277-298`) applied to the
  * training-data-pipeline's MinHash-LSH dedup operator.
  *
  * A 100 TB corpus is not deduplicated from scratch per crawl: the
  * signature index is a LIVING VIEW over a documents changelog. Per
  * batch, MinHash signatures are computed for the CHANGED docs only
  * (|Δ| signature scans, never the corpus), the banded bucket index is
  * patched (delete the changed ids' old bands, insert their new ones),
  * and the candidate-pair view is updated by retracting pairs touching
  * changed ids and probing the patched index with only the changed ids'
  * bands. The maintained pair view equals a from-scratch
  * [[Dedup.lshCandidatePairsFromSigs]] over the live corpus after every
  * batch (spec'd stepwise), while per-batch cost is O(|Δ| × bands +
  * touched-bucket joins) — a new crawl snapshot indexes against the
  * existing corpus without recomputing it.
  *
  * Scale shape: the index is only ever probed/patched through joins
  * keyed by the changed ids or their bands — under `maxLocalKeys` the
  * changed-key relation is driver-local (broadcast anti joins; the index
  * is never shuffled) and the delta-derived band frames carry explicit
  * broadcast hints; on an over-cap backlog batch everything degrades to
  * distributed shuffles (Materializer.merge discipline). The hot-bucket
  * guard drops pair GENERATION for buckets that exceed `maxBucket`
  * members (the same degenerate-content trade as the batch operator,
  * applied at probe time).
  */
object DedupIndexView {

  /** The maintained state: `index` is the banded signature index
    * `(id, band, bandHash)` of every live doc; `pairs` is the candidate
    * view `(id_a, id_b)`, id_a < id_b — all live pairs sharing at least
    * one band bucket. */
  final case class IndexState(index: DataFrame, pairs: DataFrame)

  /** The MinHash-LSH dedup index as a [[TableViews.Maintainer]] —
    * registers on the shared single-topic fan-out next to any other
    * maintained view of the documents table. `idCol` must be the
    * table's (single-column) primary key; `b`×`r` minhash permutations,
    * `nGram`-token shingles ([[Dedup.lshCandidatePairs]] parameters). */
  def maintainer(idCol: String, textCol: String,
                 b: Int = 16, r: Int = 2, nGram: Int = 5,
                 maxBucket: Int = 1000, seed: Long = 42L)
      : TableViews.Maintainer[IndexState] =
    bandIndexMaintainer(idCol, Seq(textCol), maxBucket, changedLive =>
      Dedup.minhashSignatures(changedLive, idCol, textCol,
                              k = b * r, nGram = nGram, seed = seed)
        .select(col("id"), explode(Dedup.bands(col("sig"), b, r)).as("bb"))
        .select(col("id"), col("bb.band").as("band"),
                col("bb.bandHash").as("bandHash")))

  /** The EMBEDDING near-dup (random-hyperplane LSH) index as a
    * maintainer — the semantic-dedup modality of the same living index:
    * per batch only changed vectors are re-hashed
    * ([[Dedup.embeddingLshBuckets]] over the delta), with the table
    * slot as the band and the hyperplane signature as the band hash.
    * The maintained pair view equals
    * [[Dedup.embeddingLshCandidates]] over the live corpus. */
  def embeddingMaintainer(idCol: String, vecCol: String, dim: Int,
                          tables: Int = 8, planes: Int = 12,
                          seed: Long = 42L, maxBucket: Int = 1000)
      : TableViews.Maintainer[IndexState] =
    bandIndexMaintainer(idCol, Seq(vecCol), maxBucket, changedLive =>
      Dedup.embeddingLshBuckets(changedLive, idCol, vecCol, dim,
                                tables, planes, seed)
        .select(col("id"), col("tbl").cast("int").as("band"),
                col("bucket").cast("long").as("bandHash")))

  /** The shared skeleton of every banded signature index: `bandsOf`
    * turns the batch's changed LIVE rows (`idCol` + `payloadCols`) into
    * their `(id, band, bandHash)` rows; everything else — the patch
    * algebra, the retract/probe pair maintenance, the broadcast
    * discipline, the hot-bucket guard — is modality-independent. */
  private def bandIndexMaintainer(idCol: String, payloadCols: Seq[String],
                                  maxBucket: Int,
                                  bandsOf: DataFrame => DataFrame)
      : TableViews.Maintainer[IndexState] =
    new TableViews.Maintainer[IndexState] {
      def empty(events0: DataFrame, pk: Seq[String]): IndexState = {
        require(pk == Seq(idCol),
          s"dedup index requires pk == Seq($idCol), got $pk")
        val spark = events0.sparkSession
        val idType = events0.select(col(s"after.$idCol")).schema.head.dataType
        def emptyDf(schema: StructType) = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        IndexState(
          emptyDf(StructType(Seq(
            StructField("id", idType), StructField("band", IntegerType),
            StructField("bandHash", LongType)))),
          emptyDf(StructType(Seq(
            StructField("id_a", idType), StructField("id_b", idType)))))
      }

      def step(st: IndexState, ctx: TableViews.BatchCtx): IndexState = {
        // the fan-out replay always populates changedKeys; the
        // distributed fallback covers direct/hand-built ctxs
        val ck = ctx.changedKeys.getOrElse(
            ctx.delta.select(col(s"after.$idCol").as(idCol)).distinct())
          .select(col(idCol).as("id"))
        def hinted(df: DataFrame): DataFrame =
          if (ctx.ckLocal) broadcast(df) else df
        // post-batch live rows of the changed docs: |Δ|-bounded — the
        // ONLY rows whose signatures are computed this batch
        val changedLive = Materializer.liveView(ctx.postState)
          .join(hinted(ck.select(col("id").as(idCol))), Seq(idCol),
                "left_semi")
          .select((idCol +: payloadCols).map(col): _*)
        val newBands = bandsOf(changedLive)
        // patch the index: drop every changed id's old bands (deleted
        // docs contribute no new ones), append the new bands
        val index1 = st.index.join(hinted(ck), Seq("id"), "left_anti")
          .unionByName(newBands)
        // retract pairs touching a changed id (re-emitted below if the
        // doc still collides); pairs between two unchanged docs carry
        // over untouched
        val kept = st.pairs
          .join(hinted(ck.select(col("id").as("id_a"))), Seq("id_a"),
                "left_anti")
          .join(hinted(ck.select(col("id").as("id_b"))), Seq("id_b"),
                "left_anti")
          .select(col("id_a"), col("id_b")) // USING joins front the key
        // probe ONLY the buckets the new bands touch; hot-bucket guard
        // on the POST-patch bucket population
        val touched = hinted(newBands.select("band", "bandHash").distinct())
        val sizes = index1.join(touched, Seq("band", "bandHash"), "left_semi")
          .groupBy(col("band"), col("bandHash"))
          .agg(count(lit(1)).as("__n"))
        val ok = sizes.filter(col("__n") <= maxBucket)
          .select("band", "bandHash")
        val probe = hinted(
          newBands.join(hinted(ok), Seq("band", "bandHash"), "left_semi"))
        val fresh = probe
          .join(index1.select(col("id").as("__id2"), col("band"),
                              col("bandHash")),
                Seq("band", "bandHash"))
          .filter(col("id") =!= col("__id2"))
          .select(least(col("id"), col("__id2")).as("id_a"),
                  greatest(col("id"), col("__id2")).as("id_b"))
          .distinct()
        // kept excludes changed ids and fresh always includes one, so
        // the union is disjoint — no cross-frame dedup needed
        IndexState(index1, kept.unionByName(fresh))
      }

      def pin(st: IndexState): IndexState =
        IndexState(st.index.localCheckpoint(false),
                   st.pairs.localCheckpoint(false))

      def reRoot(st: IndexState, to: SparkSession): IndexState = {
        val bb = org.apache.spark.sql.graft.bridge
        IndexState(bb.reRoot(st.index, to), bb.reRoot(st.pairs, to))
      }
    }

  /** Change-event transform planting a content FINGERPRINT column into
    * the before/after images — the derived column behind the maintained
    * EXACT-duplicate groups view ([[TableViews.withDerived]] with
    * `md5`; that helper owns the exact Maxwell partial-`old`
    * resolution). */
  def withFingerprint(textCol: String, fpCol: String = "fp")
                     (events: DataFrame): DataFrame =
    TableViews.withDerived(textCol, fpCol)(md5)(events)

  /** Serve the EXACT-duplicate groups of the live corpus off a
    * maintained fingerprint pair state
    * ([[graft.cdc.IncrementalAgg.distinctMaintainer]] over
    * [[withFingerprint]] deltas): one row per fingerprint with ≥ 2 live
    * docs — (fp, n_docs, rep_id) with the canonical min-id
    * representative. */
  def dupGroups(st: graft.cdc.IncrementalAgg.DistinctState,
                fpCol: String = "fp"): DataFrame =
    st.pairs.filter(col("net") > 0)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), min(col("v")).as("rep_id"))
      .filter(col("n_docs") >= 2)
      .select(col("g").as(fpCol), col("n_docs"), col("rep_id"))
}
