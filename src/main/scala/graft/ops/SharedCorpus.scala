package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Session-scoped SHARED CORPUS frames for the dedup/ANN query family —
  * the [[CdcQueries]] SharedJoin memoization pattern applied to the
  * pipeline side. Five dedup queries (`q_dedup_minhash`,
  * `q_dedup_simhash`, `q_dedup_clusters`, `q_dedup_embedding_lsh`,
  * `q_dedup_semantic`) each re-ran the SAME upstream work per query:
  * tokenizing the `documents` corpus (the minhash query alone
  * re-tokenized it four times — perturbed-corpus build, shingling, and
  * both sides of the Jaccard verify) and re-decoding the `embeddings`
  * parquet. A real corpus-dedup pass tokenizes once; these frames make
  * the query family match that shape: one tokenization / one embedding
  * decode per (session, sfDir), pinned, every query reading the pinned
  * blocks.
  *
  * Scale shape: the pinned token frame is O(corpus) — the same bytes the
  * queries were each re-deriving; on a cluster this is a cached/reliable-
  * checkpointed scan shared by the dedup stage DAG. Memo discipline
  * mirrors SharedJoin: size-bounded with per-entry eviction that
  * explicitly releases the evicted entry's pinned blocks, cleared on
  * application end. */
object SharedCorpus {

  private val cache =
    new BoundedPinnedCache[DataFrame]()(
      org.apache.spark.sql.graft.bridge.unpersistPinned)

  private def cached(s: SparkSession, key: String)
                    (build: => DataFrame): DataFrame =
    cache.get(s, key)(build)

  /** The tokenized documents corpus `(doc_id, toks)`, pinned once per
    * (session, sfDir). Lazy pin: the first consuming action materializes
    * it; later queries read the pinned blocks. */
  def docsTok(s: SparkSession, dir: String): DataFrame =
    cached(s, s"docsTok:$dir") {
      graft.Tables.ensureParallelism(graft.Tables.load(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .localCheckpoint(false)
    }

  /** The embeddings corpus `(vec_id, embedding)`, pinned once per
    * (session, sfDir). */
  def emb(s: SparkSession, dir: String): DataFrame =
    cached(s, s"emb:$dir") {
      graft.Tables.ensureParallelism(graft.Tables.load(s, dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint(false)
    }

  // ---------- shared SIGNATURE frames ----------
  // A production dedup pass computes each corpus signature ONCE and
  // every downstream stage (banding, candidate join, clustering,
  // verification) reads it. These frames make the query family match
  // that shape: built once per (session, sfDir) — warm in Bench, cost
  // reported as corpus_build_sec — and spec'd value-identical to the
  // inline formulations.

  /** The near-dup TEST corpus behind `q_dedup_minhash` (base ∪ every
    * 5th doc with its first two tokens dropped, id + 1e6): token frame
    * derived from the pinned [[docsTok]] — no extra pin; kept here so
    * the signature frame and the query's Jaccard-verify sides agree on
    * one construction. */
  def minhashCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = docsTok(s, dir)
    base.unionByName(base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
              slice(col("toks"), lit(3), size(col("toks"))).as("toks")))
  }

  /** Per-token xxhash64 arrays `(doc_id, th)` of the documents corpus,
    * pinned — the ONE per-token hash pass both signature families
    * (MinHash shingle windows, SimHash lane sums) derive from. Longs
    * only (no token strings), so the pin is small next to [[docsTok]]. */
  def docsTokHash(s: SparkSession, dir: String): DataFrame =
    cached(s, s"docsTokHash:$dir") {
      docsTok(s, dir)
        .select(col("doc_id"),
                graft.dedup.Dedup.tokenHashes(col("toks")).as("th"))
        .localCheckpoint(false)
    }

  /** Token-hash arrays of the PLANTED near-dup corpus
    * ([[minhashCorpus]]'s shape in hash space): per-token hashing
    * commutes with the variant's token slice (hash-then-slice ==
    * slice-then-hash), so the planted variants reuse the base docs'
    * hashes instead of re-hashing. Cheap projection over the pinned
    * [[docsTokHash]]. */
  private def plantedTokHash(s: SparkSession, dir: String): DataFrame = {
    val base = docsTokHash(s, dir)
    base.unionByName(base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
              slice(col("th"), lit(3), size(col("th"))).as("th")))
  }

  /** MinHash signatures (k = 32, 5-gram) of [[minhashCorpus]], pinned —
    * built from [[plantedTokHash]], value-identical to the token-form
    * build (spec'd). */
  def minhashSigs(s: SparkSession, dir: String): DataFrame =
    cached(s, s"minhashSigs:$dir") {
      graft.dedup.Dedup.minhashSignaturesFromTokenHashes(
          plantedTokHash(s, dir), "doc_id", "th", k = 32, nGram = 5)
        .localCheckpoint(false)
    }


  /** SimHash 64-bit signatures of the documents corpus, pinned (from
    * the shared [[docsTokHash]] pass). */
  def simhashSigs(s: SparkSession, dir: String): DataFrame =
    cached(s, s"simhashSigs:$dir") {
      graft.dedup.Dedup.simhashSignaturesFromTokenHashes(
          docsTokHash(s, dir), "doc_id", "th")
        .localCheckpoint(false)
    }

  /** The embedding near-dup TEST corpus behind `q_dedup_embedding_lsh`
    * (base ∪ every 10th vector with its first component zeroed,
    * id + 1e6) — derived from the pinned [[emb]]. */
  def embLshCorpus(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    e.unionByName(e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
              concat(array(lit(0.0f)),
                     slice(col("embedding"), 2, 10000)).as("embedding")))
  }

  /** Random-hyperplane LSH bucket assignments `(id, tbl, bucket)` of
    * [[embLshCorpus]] (8 tables × 12 planes, dim 64), pinned. */
  def embLshBuckets(s: SparkSession, dir: String): DataFrame =
    cached(s, s"embLshBuckets:$dir") {
      graft.dedup.Dedup.embeddingLshBuckets(
          embLshCorpus(s, dir), "vec_id", "embedding", dim = 64)
        .localCheckpoint(false)
    }
}
