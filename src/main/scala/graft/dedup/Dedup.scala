package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Deduplication operators for LLM training-data pipelines, each designed
  * around its shuffle profile at 100 TB:
  *
  *  - exact / fingerprint dedup: one hash-partitioned `groupBy` on a
  *    16-byte digest — shuffle carries (digest, id), never the text.
  *  - MinHash+LSH near-dup: one codegen'd hash per shingle, k family
  *    members derived arithmetically, k map-side-partial min aggregates —
  *    the shuffle carries k longs per (partition, doc), never shingle
  *    text. Candidate pairs come from same-bucket grouping on band
  *    hashes, i.e. the classic band-join, avoiding the O(n²) cross join
  *    entirely.
  *  - SimHash: 64-bit signature per doc via the same explode+partial-agg
  *    shape; near-dup = low Hamming distance within buckets of 16-bit
  *    signature chunks (pigeonhole).
  *  - n-gram Jaccard: exact verification on CANDIDATE pairs only.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup on a normalized-content fingerprint: one row per distinct
    * content, keeping the lowest id deterministically (min/count are
    * map-side partial aggs — same scale shape as Materializer). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    docs.withColumn("__fp", fp)
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  // ---------- MinHash + LSH ----------

  /** Word n-gram shingles as an array column (scan-side, no explode). */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }

  /** Mersenne prime 2^31-1 for the universal hash family
    * h_i(x) = (a_i·x + b_i) mod p — products stay < 2^62, safe under
    * ANSI overflow checking. */
  private val P = 2147483647L
  private def hashFamily(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    (Array.fill(k)(1L + rnd.nextInt(Int.MaxValue - 2)),
     Array.fill(k)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** k-wide MinHash signatures per document: `(id, sig: array<bigint>)`.
    *
    * Shape chosen for codegen + scale: explode shingles once, hash each
    * shingle string ONCE (xxhash64), derive the k family members
    * arithmetically (2 mul-add-mods each), take k `min` aggregates. The
    * whole pipeline is whole-stage-codegen'd; the shuffle carries only the
    * map-side partially-aggregated k longs per (partition, doc) — never
    * the shingle strings. (A per-row HOF formulation avoids the shuffle
    * entirely but runs interpreted: measured 60x slower at sf0.1.) */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, nGram: Int, seed: Long = 42L): DataFrame = {
    val (as, bs) = hashFamily(k, seed)
    val spread = graft.Tables.ensureParallelism(docs)
    val exploded = spread.select(col(idCol).as("id"),
        explode(shingles(col(textCol), nGram)).as("sh"))
      .select(col("id"), pmod(xxhash64(col("sh")), lit(P)).as("h"))
    val minCols = (0 until k).map(i =>
      min(pmod(col("h") * as(i) + bs(i), lit(P))).as(s"m$i"))
    exploded.groupBy(col("id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"),
              array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** (bandId, bandHash) pairs for LSH banding: b bands of r rows each
    * (k = b*r). Docs sharing any band hash are near-dup candidates. */
  def bands(signature: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)),
      i => struct(i.as("band"),
                  // xxhash64 hashes the bigint array slice directly
                  xxhash64(slice(signature, i * lit(r) + lit(1), lit(r)), i)
                    .as("bandHash")))

  /** Candidate near-dup pairs via LSH bucketing. Returns distinct
    * (id_a, id_b) with id_a < id_b. Bucket explosion guard: buckets larger
    * than `maxBucket` (degenerate content) are dropped — at scale a single
    * hot bucket would otherwise produce a quadratic pair blowup. */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                        b: Int = 16, r: Int = 2, nGram: Int = 5,
                        maxBucket: Int = 1000): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol, b * r, nGram)
    val bucketed = sig
      .select(col("id"), explode(bands(col("sig"), b, r)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bandHash"))
    val buckets = bucketed.groupBy(col("band"), col("bandHash"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    // pairs within bucket: flatten the small sorted id list (bucket sizes
    // are bounded, so this nested transform is cheap and local)
    buckets.select(explode(flatten(
        transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))),
            bVal => struct(a.as("id_a"), bVal.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Exact token-set Jaccard similarity for verifying candidate pairs. */
  def jaccard(a: Column, b: Column): Column = {
    val sa = array_distinct(TextAnalysis.tokens(a))
    val sb = array_distinct(TextAnalysis.tokens(b))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** n-gram (shingle) set Jaccard — stricter than token Jaccard. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = array_distinct(shingles(a, n))
    val sb = array_distinct(shingles(b, n))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash per row (interpreted HOF form — fine for ad-hoc column
    * use on small inputs; [[simhashSignatures]] is the codegen'd bulk
    * path). One aggregate over tokens keeps a 64-slot counter array
    * (+1/-1 per bit of each token hash); the sign pattern packs into a
    * long. */
  def simhash64(text: Column): Column = {
    val counters = aggregate(
      TextAnalysis.tokens(text),
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, i) => c + when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, 1L)
                          .otherwise(-1L))
      })
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Bulk SimHash signatures `(id, sig)` via explode + 64 codegen'd
    * conditional-sum aggregates (map-side partial agg; the shuffle carries
    * 64 longs per doc, not tokens). Same value as [[simhash64]]. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spread = graft.Tables.ensureParallelism(docs)
    val exploded = spread.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val sums = (0 until 64).map(i =>
      sum(when(call_function("shiftright", col("h"), lit(i))
            .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"c$i"))
    val packed = (0 until 64).map(i =>
      when(col(s"c$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    exploded.groupBy(col("id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("id"), packed.as("sig"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates with FULL recall for the requested
    * radius: the 64-bit signature is split into `maxHamming + 1` chunks,
    * so by pigeonhole any pair within Hamming distance `maxHamming`
    * differs in at most `maxHamming` chunks and therefore shares at least
    * one — bucketing on (chunkIdx, chunkVal) misses nothing. Candidates
    * are then verified with the exact Hamming distance. (A fixed 4-chunk
    * split guarantees recall only up to distance 3; deriving the chunk
    * count from the radius keeps the guarantee for any `maxHamming`.) */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3): DataFrame =
    simhashCandidatesFromSigs(
      simhashSignatures(docs, idCol, textCol), maxHamming)

  /** Candidate-pair generation from precomputed `(id, sig)` signatures —
    * the bucketed self-join, factored out so recall can be spec-tested on
    * signatures with planted exact Hamming distances. Narrower chunks
    * (radius 6 -> 7 chunks of ~9 bits) mean more bucket collisions than
    * the 16-bit split, but the exact-Hamming verify bounds false
    * positives; the join still shuffles (id, sig, chunk) only. */
  def simhashCandidatesFromSigs(sig: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val nChunks = maxHamming + 1
    // chunk i covers bits [bounds(i), bounds(i+1)) — an even split of 64
    val bounds = (0 to nChunks).map(i => i * 64 / nChunks)
    val chunkStructs = (0 until nChunks).map { i =>
      val lo = bounds(i); val width = bounds(i + 1) - bounds(i)
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      struct(lit(i).as("chunk"),
        call_function("shiftright", col("sig"), lit(lo))
          .bitwiseAND(lit(mask)).as("chunkVal"))
    }
    val chunks = sig.select(col("id"), col("sig"),
        explode(array(chunkStructs: _*)).as("c"))
      .select(col("id"), col("sig"), col("c.chunk"), col("c.chunkVal"))
    val a = chunks.as("a"); val bSide = chunks.as("b")
    a.join(bSide,
        col("a.chunk") === col("b.chunk") &&
        col("a.chunkVal") === col("b.chunkVal") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---------- embedding near-dup (bucketed LSH — the 100 TB path) ----------

  /** Corpus-wide embedding near-dup candidate pairs via multi-table
    * random-hyperplane LSH — the scale path that replaces the O(n²)
    * all-pairs theta join for production dedup. Shape mirrors
    * [[lshCandidatePairs]]: signatures are a narrow scan-side map
    * (codegen'd dot products per hyperplane, `Similarity.lshSignature`),
    * one shuffle on (table, bucket) carrying only (id, bucket), pair
    * generation within buckets bounded by `maxBucket` against hot-bucket
    * quadratic blowup. Recall is tuned by (tables, planes): each of the
    * `tables` hash tables uses `planes` hyperplanes, P(candidate) =
    * 1 - (1 - (1 - θ/π)^planes)^tables — for genuinely-near pairs
    * (cos ≥ 0.9) the defaults give recall > 0.99. */
  def embeddingLshCandidates(corpus: DataFrame, idCol: String, vecCol: String,
                             dim: Int, tables: Int = 8, planes: Int = 12,
                             seed: Long = 42L, maxBucket: Int = 1000): DataFrame = {
    import graft.similarity.Similarity.lshSignature
    val sigCols = (0 until tables).map(t =>
      struct(lit(t).as("tbl"),
             lshSignature(col(vecCol), dim, planes, seed + t).as("bucket")))
    val bucketed = corpus.select(col(idCol).as("id"),
        explode(array(sigCols: _*)).as("tb"))
      .select(col("id"), col("tb.tbl"), col("tb.bucket"))
    val buckets = bucketed.groupBy(col("tbl"), col("bucket"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    buckets.select(explode(flatten(
        transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))),
            bVal => struct(a.as("id_a"), bVal.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Embedding near-dup pairs above a cosine threshold, bucketed: LSH
    * candidates + exact-cosine rerank on candidates only. The exact
    * all-pairs variant (`q_dedup_embedding`) stays as the oracle baseline;
    * this is the one to run corpus-wide. */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                        dim: Int, minCosine: Double,
                        tables: Int = 8, planes: Int = 12,
                        seed: Long = 42L, maxBucket: Int = 1000): DataFrame = {
    val cand = embeddingLshCandidates(corpus, idCol, vecCol, dim,
                                      tables, planes, seed, maxBucket)
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
              graft.functions.VectorFunctions.cosine(col("va"), col("vb"))
                .as("cos"))
      .filter(col("cos") >= minCosine)
  }
}
