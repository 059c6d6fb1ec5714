package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** North-star LLM-data-pipeline operators (dedup, similarity search, text
  * analysis) over `documents` / `embeddings`. SQL-expressible variants get
  * DuckDB oracles; the hash-family ops (MinHash/SimHash/LSH — xxhash64 is
  * Spark-specific) are rows-only checked here and exactness-tested in the
  * ScalaTest specs instead.
  */
object PipelineQueries {

  // single-file tables read as one partition; these kernels are CPU-bound,
  // so spread them across the session parallelism first (no-op at scale)
  private def docs(s: SparkSession, dir: String) =
    graft.Tables.ensureParallelism(load(s, dir, "documents"))
  private def emb(s: SparkSession, dir: String) =
    graft.Tables.ensureParallelism(load(s, dir, "embeddings"))

  /** Memoized k-means quantizer per (session, corpus) — the IVF
    * codebook is trained ONCE at index build (the same discipline as
    * `cdc_ann_ivf`'s fixed centroids); queries against the index serve
    * with the frozen codebook. Rides [[BoundedPinnedCache]] like every
    * other shared-state memo — the frames are tiny LocalRelations with
    * nothing pinned (release is a no-op), but the LRU bound + session-end
    * sweep stop long-lived JVMs that churn sessions (test suites) from
    * retaining dead sessions' centroid frames and session references. */
  private val kmCache =
    new BoundedPinnedCache[org.apache.spark.sql.DataFrame]()(_ => ())
  private[graft] def kmCentroids(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    kmCache.get(s, dir)(
      graft.similarity.Similarity.kmeansCentroids(emb(s, dir), k = 16,
                                                  maxIter = 5))

  /** Shuffle width for a connected-components loop over `nodeCount`
    * graph nodes: one reducer per ~[[graft.dedup.Dedup.CcRowsPerPartition]]
    * nodes, floored at 8 (tiny graphs pay per-task constants, not data
    * volume) and capped at the SESSION width (the deployment's statement
    * of available parallelism — the CC loop runs with AQE off, so
    * overshooting the session width would strand idle reducers every
    * round). At sf0.1 the ~1.5k-node family graph resolves to the old
    * fixed 8; a 10× graph widens past it, and at 100 TB the cap hands
    * the loop whatever width the cluster was configured with. The conf
    * read is Try-wrapped (resolveBatchWidth discipline): a non-numeric
    * platform value must not turn the clustering queries into a
    * query-time NumberFormatException. */
  private[graft] def ccWidth(nodeCount: Long, s: SparkSession): Int =
    graft.dedup.Dedup.ccWidthCapped(nodeCount,
      scala.util.Try(s.conf.get("spark.sql.shuffle.partitions").toInt)
        .getOrElse(8))

  /** Engine-portable 32-bit hash of a key + seed (md5 hex prefix parsed as
    * an integer). Slower than xxhash64 but bit-identical across engines —
    * used where the SAMPLE itself must be reproducible outside Spark. */
  /** The synthetic near-dup FAMILY clustering shared by
    * q_dedup_clusters and q_split_cluster_safe: per base doc (every
    * 10th), three token-shift variants edge-joined by 5-gram Jaccard
    * >= 0.5, components labeled by min member id. Family token arrays
    * derive from the ONE pinned tokenization (dropN is an array slice,
    * not a re-split); fam is a lazy localCheckpoint, not cache — it
    * feeds three filter branches (computed once, blocks reused) and
    * the pinned blocks are released by the ContextCleaner when the
    * frame goes out of scope, where a cache() would sit in the cache
    * manager until an explicit unpersist.
    *
    * MEMOIZED per (session, sfDir): two benched queries consume the
    * identical edges→CC→labels chain, so the clustering is built once
    * and the pinned labeled frame shared (same [[BoundedPinnedCache]]
    * discipline as [[SharedCorpus]]). The CC loop width is derived
    * from the pinned family frame via [[ccWidth]] — the frame count
    * is free (it doubles as the pin-materializing action). */
  private val famCache =
    new BoundedPinnedCache[org.apache.spark.sql.DataFrame]()(
      org.apache.spark.sql.graft.bridge.unpersistPinned)
  private[graft] def familyComponents(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    famCache.get(s, dir)(buildFamilyComponents(s, dir))

  private def buildFamilyComponents(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    def dropN(n: Int) = slice(col("toks"), lit(n + 1), size(col("toks")))
    val fam = SharedCorpus.docsTok(s, dir).filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("toks").as("t0"),
              dropN(2).as("t1"), dropN(4).as("t2"))
      .localCheckpoint(false)
    def jac(a: String, b: String) =
      round(Dedup.ngramJaccardFromTokens(col(a), col(b), 5), 6) >= 0.5
    val edges =
      fam.filter(jac("t0", "t1")).select(col("doc_id").as("src"),
          (col("doc_id") + 1000000L).as("dst"))
        .union(fam.filter(jac("t1", "t2"))
          .select((col("doc_id") + 1000000L).as("src"),
                  (col("doc_id") + 2000000L).as("dst")))
        .union(fam.filter(jac("t0", "t2")).select(col("doc_id").as("src"),
          (col("doc_id") + 2000000L).as("dst")))
    val nodes = fam.select(explode(array(col("doc_id"),
        col("doc_id") + 1000000L, col("doc_id") + 2000000L)).as("doc_id"))
    // the family graph is corpus-proportional (every 10th doc × 3
    // variants ≈ 30% of corpus rows) — size the propagation loop's
    // shuffles to ITS node count, clamped to the session width; the
    // count doubles as the action that materializes fam's pin
    val width = ccWidth(fam.count() * 3, s)
    val comps = Dedup.connectedComponents(edges, "src", "dst",
      shufflePartitions = width)
    val labeled = nodes
      .join(comps, nodes("doc_id") === comps("id"), "left")
      .select(col("doc_id"),
              coalesce(col("component"), col("doc_id")).as("component"))
    // pin-and-strip: the lazy checkpoint pins the labeled frame for the
    // cache's lifetime; the reRoot drops the checkpoint-preserved join
    // partitioning so consumer plans (AQE-coalesced exchanges, unions in
    // specs) never meet a foreign fixed-width HashPartitioning
    org.apache.spark.sql.graft.bridge.reRoot(labeled.localCheckpoint(false), s)
  }

  private def portableHash(key: org.apache.spark.sql.Column, seed: Int) =
    conv(substring(md5(concat(key.cast("string"), lit(s":$seed"))), 1, 8),
         16, 10).cast("long")

  /** PLANTED ANN probe set: vectors 0..4 under a deterministic ±1.5%
    * per-dimension scale pattern, probe ids shifted past the corpus so
    * self-exclusion never removes the source. cos(probe, source)
    * ≈ 0.9999 while the best random pair in this corpus sits ≈ 0.42 —
    * so every ANN family's TRUE top-1 is the known source vector, which
    * makes the approximate indexes' actual retrieval output
    * hash-checkable against DuckDB's exact brute-force top-1 (the
    * q_agg_approx hybrid-gate discipline, but on real output rows
    * rather than pinned booleans). The perturbation arithmetic is pure
    * IEEE-double and index-driven, so both engines derive bit-identical
    * probes. */
  private def plantedProbes(e: DataFrame): DataFrame =
    plantedProbes(e, col("vec_id") < 5)

  /** [[plantedProbes]] with a caller-chosen source-id predicate —
    * cdc_ann_ivf probes LIVE vectors (ids the changelog neither deleted
    * nor re-embedded), the batch queries probe ids < 5. */
  private[ops] def plantedProbes(e: DataFrame, idCond: Column): DataFrame =
    e.filter(idCond)
      .select((col("vec_id") + 1000000L).as("q_id"),
        transform(col("embedding"),
          (x, i) => x.cast("double") *
            (lit(1.0) + lit(0.005) * ((i % 7) - 3))).as("q_vec"))

  /** Columns profiled by `q_profile` (shared with its oracle SQL). */
  private val ProfileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- dedup ----

    // exact dedup via normalized-content fingerprint, per-language stats
    "q_dedup_exact" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(TextAnalysis.fingerprint(col("text")))
               .as("n_uniq"))
        .orderBy(col("lang"))),

    // per-document fingerprints (md5 content hash — engine-portable)
    "q_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
                TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    // order-sensitive rolling token hash (no oracle: arithmetic signature)
    "q_fingerprint_rolling" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
                TextAnalysis.rollingTokenHash(col("text")).as("rh"))
        .orderBy(col("doc_id"))),

    // MinHash+LSH near-dup detection, verified with exact 5-gram Jaccard.
    // The corpus has no natural near-dups (500/500 distinct random docs),
    // so the query plants them: every 5th document reappears with its
    // first two tokens dropped (id + 1_000_000). LSH must recover those
    // planted pairs — a real recall check, not an empty result.
    // ORACLE-EXACT (hybrid): the output is the VERIFIED >= 0.5 subset of
    // the candidates, and the verified set equals the exact all-pairs
    // >= 0.5 set iff LSH recall over the true pairs is total — which is
    // DETERMINISTIC here (fixed xxhash64 signatures of a fixed corpus,
    // planted pairs' shingle sets nest so their Jaccard sits near 1 and
    // a band collision is near-certain per pair), so DuckDB recomputes
    // the exact set the heavy all-pairs way and the hashes must match.
    "q_dedup_minhash" -> ((s, dir) => {
      // shared-corpus path: ONE pinned tokenization feeds the perturbed
      // corpus, the shingle/minhash scan, and both Jaccard-verify sides
      // (the text-column formulation re-tokenized the corpus four times)
      val corpus = SharedCorpus.minhashCorpus(s, dir)
      val cand = Dedup.lshCandidatePairsFromSigs(
        SharedCorpus.minhashSigs(s, dir), b = 16, r = 2)
      val a = corpus.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
      val b = corpus.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
      cand.join(a, "id_a").join(b, "id_b")
        .select(col("id_a"), col("id_b"),
                round(Dedup.ngramJaccardFromTokens(col("toks_a"),
                                                   col("toks_b"), 5), 4)
                  .as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SimHash near-dup candidate pairs (rows-only: the hamming-ball
    // candidate set is the engine-specific face — its false positives
    // depend on the 64-bit signature values; signatures from the shared
    // pinned frame — same values as the text-column path)
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashCandidatesFromSigs(SharedCorpus.simhashSigs(s, dir),
                                      maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))),

    // NOTE a Jaccard-VERIFIED simhash face was prototyped for a hybrid
    // oracle (verification kills candidate FPs, so verified == exact
    // iff ball recall is total) and MEASURED NON-TOTAL on this corpus:
    // hamming-6 missed 11 true pairs at sf0.01, and even radius 12
    // missed an 18-token near-dup at sf0.001 — SHORT docs are SimHash's
    // inherent blind spot (dropping two tokens from a handful perturbs
    // many near-zero bit counters, unboundedly in relative terms), so
    // no bounded radius makes recall structural the way nested shingle
    // sets do for MinHash above. The candidate face stays honestly
    // rows-only; its exactness-within-radius is spec'd (PipelineSpec
    // brute-force parity both on real and adversarially bit-spread
    // signatures).

    // exact n-gram + token-set Jaccard similarity (the verifier behind the
    // LSH candidates, here oracle-checked end-to-end): every 5th document
    // vs itself with the first two tokens dropped — known-high overlap, so
    // the values are non-trivial.
    "q_dedup_ngram" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val pert = concat_ws(" ", slice(toks, lit(3), size(toks)))
      docs(s, dir)
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
                round(Dedup.ngramJaccard(col("text"), pert, 5), 6)
                  .as("jaccard5"),
                round(Dedup.jaccard(col("text"), pert), 6)
                  .as("jaccard_tok"))
        .orderBy(col("doc_id"))
    }),

    // embedding-cosine near-dup pairs above a threshold (oracle-checked);
    // exact all-pairs kernel, guarded: past the bound this MUST be the
    // LSH path below, not a bigger cluster
    "q_dedup_embedding" -> ((s, dir) => {
      val e = graft.dedup.Dedup.requireAllPairsBound(
        SharedCorpus.emb(s, dir), "q_dedup_embedding",
        "q_dedup_embedding_lsh")
      // norms hoisted per row: one dot kernel per enumerated pair
      // instead of three (bit-identical — VectorFunctions.cosineHoisted)
      val vf = graft.functions.VectorFunctions
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
                       vf.norm2(col("embedding")).as("na"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
                       vf.norm2(col("embedding")).as("nb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
                round(vf.cosineHoisted(col("va"), col("vb"),
                                       col("na"), col("nb")), 6).as("cos"))
        .filter(col("cos") > 0.3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // embedding near-dup, BUCKETED (the 100 TB path). The raw corpus has
    // no high-cosine pairs, so the query plants them: every 10th vector
    // reappears (id + 1_000_000) with its first component zeroed — cosine
    // vs the original ≈ sqrt(1 - v0²/‖v‖²) ≈ 0.99. LSH must recover those
    // pairs through bucket collisions, not an all-pairs join.
    // ORACLE-EXACT (hybrid): the output is the exact-cosine-verified
    // >= 0.9 subset of the candidates; recall of the planted pairs is
    // deterministic (fixed hyperplanes, planted cos ≈ 0.99 across 8
    // tables — a near-parallel pair lands in the same bucket in at
    // least one), so the verified set equals DuckDB's exact all-pairs
    // >= 0.9 set over the same planted corpus. Recall vs the exact
    // baseline stays asserted in PipelineSpec.
    "q_dedup_embedding_lsh" -> ((s, dir) => {
      // bucket assignments from the shared pinned signature frame; the
      // timed work is pair generation + exact-cosine rerank
      val corpus = SharedCorpus.embLshCorpus(s, dir)
      val cand = Dedup.embeddingLshPairsFromBuckets(
        SharedCorpus.embLshBuckets(s, dir))
      val vf = graft.functions.VectorFunctions
      val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"),
                            vf.norm2(col("embedding")).as("na"))
      val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
                            vf.norm2(col("embedding")).as("nb"))
      cand.join(a, "id_a").join(b, "id_b")
        .select(col("id_a"), col("id_b"),
                vf.cosineHoisted(col("va"), col("vb"),
                                 col("na"), col("nb")).as("cos"))
        .filter(col("cos") >= 0.9)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // near-dup CLUSTERS via connected components (oracle: recursive CTE).
    // Pipeline shape: candidate pairs -> exact-verify -> edges ->
    // components -> keep min-id doc per component. Planted chains: every
    // 10th doc gets two derived variants (drop 2 / drop 4 leading tokens);
    // edges are exact 5-gram Jaccard >= 0.5 WITHIN each family, so some
    // families chain 0-1-2 transitively even when 0-2 alone falls below
    // the threshold — exactly what component-finding is for. The edge set
    // is deliberately oracle-expressible (per-family pairwise Jaccard);
    // the operator under test is the distributed min-label propagation.
    "q_dedup_clusters" -> ((s, dir) =>
      familyComponents(s, dir).orderBy(col("doc_id"))),

    // CLUSTER-ATOMIC SPLIT: the near-dup sibling of
    // q_split_leakage_safe — every member of a NEAR-duplicate cluster
    // (the connected components over Jaccard >= 0.5 edges) lands in
    // the same train/val/test split, so paraphrase-level rewrites can
    // never straddle train and test. The md5 threshold hashes the
    // cluster id (its min member — deterministic), which keeps the
    // assignment a pure function of the clustering; the rollup is a
    // map-side partial agg over |docs| rows.
    "q_split_cluster_safe" -> ((s, dir) => {
      val h = substring(
        md5(concat(col("component").cast("string"), lit(":csplit"))), 1, 8)
      familyComponents(s, dir)
        .withColumn("split",
          when(h < "e6666666", "train")
            .when(h < "f3333333", "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("component")).as("n_clusters"))
        .orderBy(col("split"))
    }),

    // train/eval decontamination: flag corpus docs sharing any 5-gram with
    // a benchmark set (doc_id < 20 plays the eval set). Known contamination
    // is planted — every 7th corpus doc gets the first 8 tokens of
    // benchmark doc (doc_id % 20) appended — and the synthetic corpus also
    // carries a few NATURAL phrase overlaps, both of which belong flagged.
    // Scale shape: benchmark n-grams are a SMALL distinct set -> the join
    // broadcasts; the corpus side is scan+explode with map-side distinct,
    // so the only wide exchange is the final per-doc count.
    "q_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") < 20)
        .select(col("doc_id").as("b_id"), col("text").as("b_text"))
      val benchGrams = bench
        .select(explode(array_distinct(Dedup.shingles(col("b_text"), 5)))
          .as("gram"))
        .distinct()
      val planted = d.filter(col("doc_id") >= 20 && col("doc_id") % 7 === 0)
        .join(broadcast(bench), col("doc_id") % 20 === col("b_id"))
        .select(col("doc_id"),
                concat(col("text"), lit(" "),
                  concat_ws(" ",
                    slice(TextAnalysis.tokens(col("b_text")), 1, 8)))
                  .as("text"))
      val corpus = d.filter(col("doc_id") >= 20 && col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("text"))
        .unionByName(planted)
      corpus.select(col("doc_id"),
          explode(array_distinct(Dedup.shingles(col("text"), 5))).as("gram"))
        .join(benchGrams, "gram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
        .orderBy(col("doc_id"))
    }),

    // decontamination at 100 TB: the benchmark gram set travels as a
    // BLOOM FILTER (a few KB of bytes, built by one aggregate) instead of
    // a broadcast distinct-gram table — constant-size no matter how many
    // benchmarks are registered, and the corpus-side probe is a pure
    // scan-side `might_contain` with NO join at all. False positives are
    // possible by construction, so this is rows-only gated; the spec
    // asserts it flags a superset of the exact operator's hits with a
    // bounded FP overhead. Same planted-contamination corpus as
    // `q_decontaminate`, so the two operators are directly comparable.
    "q_decontaminate_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") < 20)
        .select(col("doc_id").as("b_id"), col("text").as("b_text"))
      // build once, collect the ~10 KB filter to the driver, embed as a
      // binary literal — the same ship-to-tasks shape Spark's own runtime
      // join pruning uses (might_contain requires a constant/subquery
      // filter side, not an arbitrary column)
      val bfBytes = bench
        .select(explode(array_distinct(Dedup.shingles(col("b_text"), 5)))
          .as("gram"))
        .agg(graft.functions.SketchFunctions.bloomFilterAgg(
          xxhash64(col("gram")), 5000L, 80000L).as("bf"))
        .collect()(0).getAs[Array[Byte]]("bf")
      val planted = d.filter(col("doc_id") >= 20 && col("doc_id") % 7 === 0)
        .join(broadcast(bench), col("doc_id") % 20 === col("b_id"))
        .select(col("doc_id"),
                concat(col("text"), lit(" "),
                  concat_ws(" ",
                    slice(TextAnalysis.tokens(col("b_text")), 1, 8)))
                  .as("text"))
      val corpus = d.filter(col("doc_id") >= 20 && col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("text"))
        .unionByName(planted)
      corpus.select(col("doc_id"),
          explode(array_distinct(Dedup.shingles(col("text"), 5))).as("gram"))
        .filter(graft.functions.SketchFunctions.mightContain(
          lit(bfBytes), xxhash64(col("gram"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
        .orderBy(col("doc_id"))
    }),

    // mergeable distinct-count sketches (Datasketches HLL): per-month
    // sketches of the customer set, re-aggregated per status by sketch
    // UNION — the pre-aggregation/streaming COUNT DISTINCT path. At
    // 100 TB the monthly sketch table is what you persist; any rollup
    // (per status, per year, global) is a union over a few KB of sketch
    // bytes, never a rescan of raw orders. HYBRID oracle: the
    // Datasketches estimate is engine-specific so it cannot hash-match
    // DuckDB, but the exact distinct CAN — the unioned estimate enters
    // the gate as a BOUND (within 10%, generous vs HLL lgK=12's ~1.6%
    // error, emitted as a boolean the oracle pins to TRUE); the spec
    // asserts union-merge == direct one-pass sketch and tighter error.
    "q_hll_mergeable" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val monthly = o.groupBy(col("o_orderstatus"),
                              month(col("o_orderdate")).as("m"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val unioned = monthly.groupBy(col("o_orderstatus"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("approx_cust"))
      o.groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
        .join(unioned, "o_orderstatus")
        .select(col("o_orderstatus"), col("n_cust"),
                (abs(col("approx_cust") - col("n_cust")) <=
                  col("n_cust") * 0.1).as("union_within_10pct"))
        .orderBy(col("o_orderstatus"))
    }),

    // Mergeable QUANTILE sketches (Datasketches KLL via graft's native
    // TypedImperativeAggregate — see KllFunctions): per-month price
    // sketches, re-aggregated per status by sketch MERGE. The quantile
    // analogue of q_hll_mergeable, and the only way percentiles
    // pre-aggregate: exact percentile (q_percentile) must see all raw
    // values, so a 100 TB pipeline persists the monthly sketch table
    // (few KB per group) and answers any rollup by merging sketches.
    // HYBRID oracle (the q_agg_approx pattern): the sketch count and
    // group keys are hash-checked exactly; each quantile estimate is
    // pinned as a within-exact-rank-band boolean (±3% rank — KLL k=200
    // guarantees ±1.65% at 99% confidence), the bands computed from
    // Spark's exact percentile so the boolean is engine-portable TRUE.
    // Merge==direct equivalence and the rank-error bound stay spec'd.
    "q_quantile_sketch" -> ((s, dir) => {
      import graft.functions.KllFunctions._
      val o = load(s, dir, "orders")
      val monthly = o.groupBy(col("o_orderstatus"),
                              month(col("o_orderdate")).as("m"))
        .agg(kllSketchAgg(col("o_totalprice")).as("sk"))
      val sk = monthly.groupBy(col("o_orderstatus"))
        .agg(kllMergeAgg(col("sk")).as("sk"))
        .select(col("o_orderstatus"),
                kllQuantile(col("sk"), lit(0.5)).as("p50"),
                kllQuantile(col("sk"), lit(0.95)).as("p95"),
                kllQuantile(col("sk"), lit(0.99)).as("p99"),
                kllCount(col("sk")).as("n"))
      val ex = o.groupBy(col("o_orderstatus"))
        .agg(expr("percentile(o_totalprice, " +
          "array(0.47, 0.53, 0.92, 0.98, 0.96, 1.0))").as("q"))
        .select(col("o_orderstatus"),
                col("q")(0).as("lo50"), col("q")(1).as("hi50"),
                col("q")(2).as("lo95"), col("q")(3).as("hi95"),
                col("q")(4).as("lo99"), col("q")(5).as("hi99"))
      sk.join(broadcast(ex), "o_orderstatus")
        .select(col("o_orderstatus"), col("n"),
                col("p50").between(col("lo50"), col("hi50"))
                  .as("p50_in_band"),
                col("p95").between(col("lo95"), col("hi95"))
                  .as("p95_in_band"),
                col("p99").between(col("lo99"), col("hi99"))
                  .as("p99_in_band"))
        .orderBy(col("o_orderstatus"))
    }),

    // Mergeable SET-OPERATION sketches (Datasketches Theta via graft's
    // native TypedImperativeAggregate — see ThetaFunctions): per-source
    // sketches of the text's distinct bigrams, then the full pairwise
    // source-overlap matrix (|A ∩ B| and |A \ B|) from the 20 sketches
    // alone. The capability HLL lacks: intersections/differences —
    // decontamination SIZING ("how much do these corpora share") before
    // committing to an exact pass. At 100 TB: ONE scan builds a ~KB
    // sketch per slice; every pairwise question after that is
    // constant-time sketch algebra — no join, no second scan. The
    // shuffle carries 20 compact sketches, the cross join is 20×20.
    // Oracle-exact (like q_heavy_hitters): this corpus' bigram
    // vocabulary (≤ ~1k per source) stays under the sketch's 4096
    // nominal entries, so estimates are exact; real corpora exceed it
    // and get ±1.6% estimates — asserted separately in the spec.
    "q_overlap_theta" -> ((s, dir) => {
      import graft.functions.ThetaFunctions._
      val bg = docs(s, dir).select(col("source"),
        explode(TextAnalysis.bigrams(TextAnalysis.tokens(col("text"))))
          .as("bg"))
      val sk = bg.groupBy(col("source"))
        .agg(thetaSketchAgg(col("bg")).as("sk"))
        .localCheckpoint(false) // |sources| rows; scanned by both sides
      val a = sk.select(col("source").as("src_a"), col("sk").as("sk_a"))
      val b = sk.select(col("source").as("src_b"), col("sk").as("sk_b"))
      a.crossJoin(broadcast(b)).filter(col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          round(thetaEstimate(thetaIntersect(col("sk_a"), col("sk_b"))))
            .cast("long").as("n_common"),
          round(thetaEstimate(thetaANotB(col("sk_a"), col("sk_b"))))
            .cast("long").as("n_only_a"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Column-level data profiling (see Profiler): the first query run
    // against any new corpus drop. The oracle-checked variant is the
    // EXACT path (stacked two-phase distinct — one (col, value) shuffle
    // with map-side partials, never a multi-COUNT-DISTINCT expand); the
    // 100 TB default is the approx path (single scan, HLL++ partials, no
    // value shuffle), spec-asserted against exact within HLL error.
    "q_profile" -> ((s, dir) =>
      Profiler.profile(load(s, dir, "orders"), ProfileCols, exact = true)),

    // ---- similarity search ----

    // brute-force exact cosine top-3 (the ANN baseline; oracle-checked)
    "q_sim_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopK(e, queries, k = 3)
        .select(col("q_id"), col("rk"), col("neighbor_id"),
                round(col("cos"), 6).as("cos"))
        .orderBy(col("q_id"), col("rk"))
    }),

    // LSH-bucketed ANN over the PLANTED probe set (oracle-exact: the
    // probes' true nearest neighbors are known, so the ANN's actual
    // top-1 output hash-matches DuckDB's brute-force top-1 — a real
    // retrieval check, not a pinned boolean). Random-probe recall
    // floors stay spec'd in PipelineSpec.
    "q_sim_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(e, plantedProbes(e), k = 3, dim = 64, planes = 4)
        .filter(col("rk") === 1)
        .select(col("q_id"), col("neighbor_id"),
                round(col("cos"), 6).as("cos"))
        .orderBy(col("q_id"))
    }),

    // IVF with TRAINED centroids: k-means (Lloyd's via Spark MLlib) over
    // the corpus replaces the deterministic-subset stand-in — the real
    // index-build path. Oracle-exact on the planted probes (the
    // centroids are engine-specific but the retrieved neighbor is not);
    // random-probe recall is asserted in PipelineSpec.
    "q_sim_ivf_kmeans" -> ((s, dir) => {
      val e = emb(s, dir)
      val centroids = kmCentroids(s, dir)
      val assigned = Similarity.ivfAssign(e, centroids)
      Similarity.ivfTopK(assigned, centroids, plantedProbes(e),
          k = 3, nprobe = 4)
        .filter(col("rk") === 1)
        .select(col("q_id"), col("neighbor_id"),
                round(col("cos"), 6).as("cos"))
        .orderBy(col("q_id"))
    }),

    // IVF ANN (the 100 TB scale path), oracle-exact on planted probes
    "q_sim_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      val centroids = e.filter(col("vec_id") % 50 === 0)
      val assigned = Similarity.ivfAssign(e, centroids)
      Similarity.ivfTopK(assigned, centroids, plantedProbes(e),
          k = 3, nprobe = 3)
        .filter(col("rk") === 1)
        .select(col("q_id"), col("neighbor_id"),
                round(col("cos"), 6).as("cos"))
        .orderBy(col("q_id"))
    }),

    // ---- corpus statistics / data mixing ----

    // vocabulary frequency table (the tokenizer-training precursor):
    // top-50 tokens by document frequency and total count
    "q_token_freq" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
                explode(array_distinct(TextAnalysis.tokens(col("text"))))
                  .as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("tok"))
        .limit(50)),

    // Mergeable HEAVY-HITTERS sketches (Datasketches frequent-items via
    // graft-native TypedImperativeAggregates, FreqFunctions) — the third
    // sketch of the triad (HLL distinct / KLL quantiles / frequent
    // items): top tokens per language, built as per-(lang, source) shard
    // sketches and rolled up by sketch MERGE — at 100 TB the shard
    // sketch table is what you persist; no |vocabulary|-sized exact
    // count table ever shuffles. Oracle-exact HERE because this corpus'
    // vocabulary (31 tokens) sits far under the 64-slot map's purge
    // threshold, so the sketch never estimates — the general-case
    // error-bound/no-false-negative semantics are spec-asserted with a
    // planted over-capacity stream (FunctionsSpec).
    "q_heavy_hitters" -> ((s, dir) => {
      import graft.functions.FreqFunctions._
      import org.apache.spark.sql.expressions.Window
      val toks = docs(s, dir).select(col("lang"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val sharded = toks.groupBy(col("lang"), col("source"))
        .agg(freqSketchAgg(col("tok"), 64).as("sk"))
      val items = sharded.groupBy(col("lang"))
        .agg(freqMergeAgg(col("sk"), 64).as("sk"))
        .select(col("lang"), explode(freqItems(col("sk"))).as("hh"))
        .select(col("lang"), col("hh.item").as("tok"),
                col("hh.estimate").as("n_tok"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_tok").desc, col("tok"))
      items.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("lang"), col("rk"), col("tok"), col("n_tok"))
        .orderBy(col("lang"), col("rk"))
    }),

    // deterministic stratified sample by language (data-mixing primitive).
    // Hash-based, not RNG-based, so the sample is stable across runs AND
    // cluster layouts; the hash is md5-derived (not xxhash64) so it is
    // engine-portable and the sample itself is oracle-exact vs DuckDB.
    "q_sample_stratified" -> ((s, dir) => {
      val fractions = Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.25,
                          "zh" -> 0.1, "fr" -> 0.1)
      val frac = fractions.foldLeft(lit(0.05)) { case (acc, (l, f)) =>
        when(col("lang") === l, f).otherwise(acc)
      }
      docs(s, dir)
        .filter(pmod(portableHash(col("doc_id"), 42), lit(10000L)) <
                frac * 10000)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // deterministic per-group k-sample (reservoir-equivalent): rank docs
    // within each language by a portable hash and keep the first k — a
    // uniform-without-replacement sample that is stable across runs,
    // cluster layouts, and engines (hence oracle-exact). One shuffle on
    // the group key; at 100 TB swap the full per-group sort for the
    // TopKAggregator (per-partition heaps + merge) — same answer, the
    // shuffle then carries k rows per partition instead of all of them.
    "q_sample_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(portableHash(col("doc_id"), 7), col("doc_id"))
      docs(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    }),

    // weighted upsampling (data-mixing: repeat docs by per-language weight
    // before training-shard assembly). explode(sequence) is a narrow
    // generator — no shuffle; at 100 TB the repeat factor multiplies
    // output partitions, not input reads.
    "q_mix_upsample" -> ((s, dir) => {
      val w = when(col("lang") === "en", 3)
        .when(col("lang") === "de", 2).otherwise(1)
      docs(s, dir)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("lang"),
                explode(sequence(lit(1), w)).as("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // embedding normalization + int8 quantization (the storage/serving
    // compression step of an embedding pipeline). Pure scan-side array
    // expressions — zero shuffle at any scale; doubles throughout so the
    // arithmetic is bit-identical to the DuckDB oracle.
    // per-label embedding centroids (class prototypes for clustering /
    // nearest-class-mean filtering). posexplode → (label, pos) avg: the
    // explode multiplies rows ×dim but the map-side partial agg collapses
    // them before the shuffle, so shuffle traffic is |labels|×dim
    // regardless of corpus size — the scalable alternative to
    // collect_list-then-average, which would ship every vector.
    "q_embed_centroid" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "e")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("e").cast("double")), 6).as("c"))
        .select(col("label"), col("pos").cast("long").as("pos"), col("c"))
        .orderBy(col("label"), col("pos"))),

    "q_embed_quantize" -> ((s, dir) => {
      val v = col("embedding").cast("array<double>")
      val norm = sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))
      val maxAbs = array_max(transform(v, x => abs(x)))
      // scale by 127/max|x|; a zero vector (max|x| = 0) quantizes to zeros
      // instead of dividing by zero (ANSI cast of Inf would fail the job)
      val q8 = transform(v, x =>
        when(maxAbs === 0.0d, lit(0.0d))
          .otherwise(round(x * 127.0d / maxAbs)).cast("tinyint"))
      // q8 is emitted as its canonical "[a,b,...]" string: the driver's
      // oracle compare (pandas sort + hash) cannot hash a raw array column,
      // so the gate only holds if both engines emit the same scalar string
      emb(s, dir).select(
          col("vec_id"),
          round(norm, 4).as("l2_norm"),
          round(maxAbs, 6).as("max_abs"),
          concat(lit("["), array_join(q8.cast("array<string>"), ","), lit("]"))
            .as("q8"))
        .orderBy(col("vec_id"))
    }),

    // sequence packing (pretraining-shard assembly): concatenate docs in
    // deterministic order within hash shards, chunk the token stream into
    // fixed-size packs; each doc reports its pack and offset. Scale shape:
    // ONE window (running sum) per shard partition — shards bound the
    // sort, so no global ordering is ever materialized; at 100 TB shards
    // map 1:1 to output training files.
    "q_pack_sequences" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val seqLen = 2048L
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"),
                TextAnalysis.tokenCount(col("text")).as("n_tokens"),
                pmod(portableHash(col("doc_id"), 13), lit(8L)).as("shard"))
        .withColumn("start_off",
          coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
        .select(col("shard"), col("doc_id"), col("n_tokens"),
                floor(col("start_off") / seqLen).as("pack_id"),
                pmod(col("start_off"), lit(seqLen)).as("offset_in_pack"))
        .orderBy(col("shard"), col("doc_id"))
    }),

    // ---- text analysis ----

    "q_text_stats" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
                TextAnalysis.tokenCount(col("text")).as("n_tokens"),
                TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
                round(TextAnalysis.avgTokenLen(col("text")), 6)
                  .as("avg_tok_len"),
                round(TextAnalysis.alphaRatio(col("text")), 6)
                  .as("alpha_ratio"))
        .orderBy(col("doc_id"))),

    "q_text_lang" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(col("lang"),
                 TextAnalysis.langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred"))),

    "q_text_quality" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
                TextAnalysis.qualityScore(col("text")).as("quality"),
                round(TextAnalysis.stopwordRatio(col("text")), 6)
                  .as("stopword_ratio"))
        .orderBy(col("doc_id"))),

    // Gopher-style repetition filters: duplicate-token and top-bigram
    // fractions per document, with the drop decision done in INTEGER
    // arithmetic (10*(n_tok-n_utok) > 3*n_tok ⇔ dup_tok_frac > 0.3;
    // 50*top_bg_c > 9*n_bg ⇔ top_bigram_frac > 0.18) so the output is
    // engine-exact — no float rounding at the decision boundary.
    // Scale shape: token/array stats are scan-side; the only shuffle is
    // the (doc, bigram) partial-agg count — the TF shape, |grams|-bounded
    // with map-side combine. explode_outer keeps sub-2-token docs.
    // token-diversity quality signal: per-language mean Shannon token
    // entropy (TextAnalysis.tokenEntropy — the O(k log k) sorted-run
    // fold, scan-side) plus the low-diversity share under a fixed
    // threshold. Zero shuffles before the per-lang rollup; the oracle
    // recomputes entropy the heavy way (unnest + per-(doc, tok)
    // counts) so the fold is cross-checked against an independent
    // derivation, not itself.
    "q_text_entropy" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"),
                TextAnalysis.tokenEntropy(col("text")).as("ent"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             round(avg(col("ent")), 4).as("avg_entropy"),
             sum(when(col("ent") < 3.0, 1L).otherwise(0L))
               .as("n_low_diversity"))
        .orderBy(col("lang"))),

    "q_text_repetition" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
        .select(col("doc_id"),
                size(col("t")).cast("long").as("n_tok"),
                size(array_distinct(col("t"))).cast("long").as("n_utok"),
                explode_outer(TextAnalysis.bigrams(col("t"))).as("bg"))
        .groupBy(col("doc_id"), col("n_tok"), col("n_utok"), col("bg"))
        .agg(count(col("bg")).as("c"))
        .groupBy(col("doc_id"), col("n_tok"), col("n_utok"))
        .agg(sum(col("c")).as("n_bg"),
             count(when(col("bg").isNotNull, 1)).as("n_ubg"),
             max(col("c")).as("top_bg_c"))
        .select(col("doc_id"), col("n_tok"), col("n_utok"),
                col("n_bg"), col("n_ubg"), col("top_bg_c"),
                ((col("n_tok") - col("n_utok")) * 10 > col("n_tok") * 3 ||
                 col("top_bg_c") * 50 > col("n_bg") * 9).as("gopher_drop"))
        .orderBy(col("doc_id"))),

    // Unigram-LM perplexity proxy (CCNet-style quality signal): the LM is
    // the corpus's own unigram distribution; each doc scores its mean
    // negative log-likelihood under it (high = unusual token mix). Scale
    // shape: tf = ONE (doc,term) shuffle with map-side partials (cached —
    // it feeds both the vocab counts and the scoring branch); vocab is
    // |vocab|-bounded; the tf⋈vocab equi-join shuffles on term (AQE
    // broadcasts when vocab is small); final per-doc combine is
    // |docs|-bounded. Nothing touches raw text twice.
    "q_text_perplexity" -> ((s, dir) => {
      // lazy localCheckpoint, not cache (see q_dedup_clusters): tf feeds
      // both the vocab branch and the scoring join; blocks auto-release
      val tf = SharedCorpus.docsTok(s, dir)
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
        .localCheckpoint(false)
      val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
      val total = vocab.agg(sum(col("cnt")).as("n_total"))
      tf.join(vocab, "tok")
        .crossJoin(broadcast(total))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tok"),
             round(-sum(col("tf").cast("double") *
                        log(col("cnt").cast("double") / col("n_total"))) /
                     sum(col("tf")),
                   4).as("nll"))
        .orderBy(col("doc_id"))
    }),

    // TF-IDF top terms per document (retrieval / relevance primitive).
    // Scale shape: tf = one shuffle on (doc, term) with map-side partial
    // counts; df joins on term (vocabulary-sized — broadcastable); the
    // per-doc top-k window sorts only each doc's own terms.
    "q_tfidf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val nDocs = d.agg(count(lit(1)).as("n_docs"))
      // lazy localCheckpoint: tf feeds BOTH the df branch and the filtered
      // scoring branch — without pinning, the explode+count subtree runs
      // twice; unlike cache(), the pinned blocks auto-release when the
      // frame goes out of scope (no per-invocation storage accumulation)
      val tf = SharedCorpus.docsTok(s, dir)
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
        .localCheckpoint(false)
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("tok"))
      tf.filter(col("doc_id") < 10)
        .join(dfreq, "tok")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          round(col("tf") *
            (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1),
            4))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("doc_id"), col("rk"), col("tok"), col("tfidf"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // ---- multimodal ----

    // the binary-column pipeline end-to-end: documents -> synthetic media
    // payloads (utf8 bytes; the sandbox has no codecs) -> resize cap ->
    // frame sampling -> per-frame digest. Exercises the REAL plumbing
    // (binary columns, payload-local transforms, explode-bounded row
    // growth); the corpus is ASCII so the byte-level frames are
    // oracle-exact against DuckDB character substrings.
    "q_multimodal_frames" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.syntheticMediaFromDocuments(docs(s, dir))
      val sized = Multimodal.resizePayload(media, maxBytes = 2048)
      Multimodal.sampleFrames(sized, frameBytes = 256, everyK = 4)
        .select(col("media_id"), col("frame_idx"),
                length(col("frame")).as("frame_len"),
                md5(col("frame")).as("frame_md5"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // PII scrubbing (contamination/compliance pass): detect + redact
    // emails and URLs. Pure regexp expressions — a narrow scan-side map
    // with zero shuffle at any scale. The testdata corpus carries no PII,
    // so the query plants a deterministic email+URL per doc first.
    "q_text_scrub" -> ((s, dir) => {
      val dirty = concat(lit("contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or http://ex"), col("doc_id").cast("string"),
        lit(".com/x "), col("text"))
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val urlRe = "https?://[^ ]+"
      docs(s, dir)
        .select(col("doc_id"),
                size(regexp_extract_all(dirty, lit(emailRe), lit(0)))
                  .as("n_emails"),
                size(regexp_extract_all(dirty, lit(urlRe), lit(0)))
                  .as("n_urls"),
                substring(
                  regexp_replace(regexp_replace(dirty, urlRe, "<URL>"),
                                 emailRe, "<EMAIL>"),
                  1, 60).as("scrubbed_head"))
        .orderBy(col("doc_id"))
    }),

    // Z-ORDER layout assignment (ZOrder.interleave — Morton curve over
    // customer × order-day, both min/max-normalized to the full 16-bit
    // grid): bucket orders by the z-value's TOP 6 bits (the static 8×8
    // Morton grid) and report each bucket's min/max range in BOTH
    // dimensions. The property that matters for 100 TB: every bucket's
    // per-dimension ranges stay narrow SIMULTANEOUSLY (≤ 2^13 on a 2^16
    // domain — a single-column sort nails one dimension and leaves the
    // other spanning the whole domain), which is what lets parquet
    // row-group min/max stats prune scans on either predicate. All
    // scan-side codegen'd bit arithmetic — no window, no UDF; the
    // dimension stats are one broadcast scalar row. The write path is
    // ZOrder.layout (repartitionByRange over the full z for balanced
    // files); the static grid here is the oracle-checkable assignment.
    "q_layout_zorder" -> ((s, dir) => {
      val o = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("d1r"),
                expr("unix_micros(cast(o_orderdate as timestamp_ltz)) " +
                     "div 86400000000").as("d2r"))
      val stats = o.agg(min(col("d1r")).as("mn1"), max(col("d1r")).as("mx1"),
                        min(col("d2r")).as("mn2"), max(col("d2r")).as("mx2"))
      def scaled(v: Column, mn: Column, mx: Column) =
        floor((v - mn) * lit(65535.0) / (mx - mn)).cast("long")
      o.crossJoin(broadcast(stats))
        .withColumn("d1", scaled(col("d1r"), col("mn1"), col("mx1")))
        .withColumn("d2", scaled(col("d2r"), col("mn2"), col("mx2")))
        .withColumn("bucket", shiftright(ZOrder.interleave(col("d1"),
                                                           col("d2")), 26))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
             min(col("d1")).as("d1_min"), max(col("d1")).as("d1_max"),
             min(col("d2")).as("d2_min"), max(col("d2")).as("d2_max"))
        .orderBy(col("bucket"))
    }))

  private val normText =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  // DuckDB mirror of TextAnalysis.wordHits
  private def hitsSql(word: String): String = {
    val needle = s" $word "
    s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$needle', ''))) / ${needle.length} AS INT)"
  }
  private def langScoreSql(lang: String): String =
    TextAnalysis.langMarkers(lang).map(hitsSql).mkString("(", " + ", ")")

  // shared DuckDB fragments for the token/shingle oracles
  private val toksSql =
    "string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
  private def shingleSql(toksExpr: String): String =
    s"""CASE WHEN len($toksExpr) < 5 THEN [array_to_string($toksExpr, ' ')]
       |     ELSE list_transform(generate_series(1, len($toksExpr) - 4),
       |            i -> array_to_string(($toksExpr)[i:i+4], ' ')) END"""
      .stripMargin

  // DuckDB mirror of Dedup.ngramJaccard on two precomputed shingle lists
  private def jacSql(s1: String, s2: String): String =
    s"""round(CAST(len(list_intersect(list_distinct($s1),
       |                              list_distinct($s2))) AS DOUBLE)
       |      / len(list_distinct(list_concat($s1, $s2))), 6)""".stripMargin

  /** DuckDB brute-force exact top-1 over the planted probe set — the
    * shared oracle for the three ANN families (the exact answer is the
    * same regardless of which approximate index found it). Keep the
    * probe arithmetic in lockstep with [[plantedProbes]]; DuckDB's
    * lambda index is 1-based where Spark's is 0-based. */
  private val annPlantedOracle: String =
    """WITH q AS (SELECT vec_id + 1000000 AS q_id,
      |             list_transform(embedding::DOUBLE[],
      |               (x, i) -> x * (1 + 0.005 * (((i - 1) % 7) - 3)))
      |               AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT q_id, vec_id AS neighbor_id,
      |        list_cosine_similarity(qv, v) AS cos,
      |        row_number() OVER (PARTITION BY q_id
      |          ORDER BY list_cosine_similarity(qv, v) DESC, vec_id)
      |          AS rk
      |      FROM q, c)
      |SELECT q_id, neighbor_id, round(cos, 6) AS cos
      |FROM s WHERE rk = 1 ORDER BY q_id""".stripMargin

  /** DuckDB exact all-pairs >= 0.5 near-dup set of the PLANTED text
    * corpus (base ∪ every 5th doc with its first two tokens dropped,
    * id + 1e6) — the hybrid oracle for the verified MinHash route
    * (`q_dedup_minhash`): its verified output equals this exact set
    * because the output is always a SUBSET (verification is exact) and
    * recall is deterministic-total (fixed signatures of a fixed
    * corpus; a planted variant's shingle set NESTS in its source's, so
    * its Jaccard sits near 1 and band collision is near-certain —
    * measured total at every SF). Jaccard is rounded to 4 before the
    * threshold, mirroring the Spark side. */
  private val plantedNearDupOracle: String =
    s"""WITH base AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |corpus AS (
       |  SELECT doc_id, toks FROM base
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, toks[3:] AS toks
       |  FROM base WHERE doc_id % 5 = 0),
       |s AS (SELECT doc_id, list_distinct(${shingleSql("toks")}) AS sh
       |      FROM corpus),
       |p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |          / len(list_distinct(list_concat(a.sh, b.sh))), 4)
       |      AS jaccard
       |  FROM s a, s b WHERE a.doc_id < b.doc_id)
       |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_dedup_minhash" -> plantedNearDupOracle,
    // exact all-pairs >= 0.9 cosine over the planted embedding corpus
    // (every 10th vector re-planted with its first component zeroed) —
    // the hybrid oracle for the verified embedding-LSH route; the raw
    // cosine gates the threshold (like the Spark side), rounding only
    // the output
    "q_dedup_embedding_lsh" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |corpus AS (
        |  SELECT vec_id, v FROM e
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |    list_concat([0.0], v[2:]) AS v
        |  FROM e WHERE vec_id % 10 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |FROM corpus a, corpus b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.v, b.v) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "q_sim_lsh" -> annPlantedOracle,
    "q_sim_ivf" -> annPlantedOracle,
    "q_sim_ivf_kmeans" -> annPlantedOracle,
    "q_quantile_sketch" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  TRUE AS p50_in_band, TRUE AS p95_in_band, TRUE AS p99_in_band
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hll_mergeable" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  TRUE AS union_within_10pct
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_layout_zorder" -> {
      val z = ZOrder.interleaveSql("d1", "d2")
      s"""WITH o AS (
        |  SELECT o_orderkey, o_custkey AS d1r,
        |    CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS d2r
        |  FROM orders),
        |st AS (
        |  SELECT min(d1r) AS mn1, max(d1r) AS mx1,
        |         min(d2r) AS mn2, max(d2r) AS mx2 FROM o),
        |sc AS (
        |  SELECT o_orderkey,
        |    CAST(floor((d1r - mn1) * 65535.0 / (mx1 - mn1)) AS BIGINT) AS d1,
        |    CAST(floor((d2r - mn2) * 65535.0 / (mx2 - mn2)) AS BIGINT) AS d2
        |  FROM o CROSS JOIN st),
        |zb AS (SELECT *, ($z) >> 26 AS bucket FROM sc)
        |SELECT bucket, count(*) AS n,
        |  min(d1) AS d1_min, max(d1) AS d1_max,
        |  min(d2) AS d2_min, max(d2) AS d2_max
        |FROM zb GROUP BY bucket ORDER BY bucket""".stripMargin
    },
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE
        |fam AS (
        |  SELECT doc_id, $toksSql AS toks,
        |    string_split(array_to_string(($toksSql)[3:], ' '), ' ')
        |      AS toks1,
        |    string_split(array_to_string(($toksSql)[5:], ' '), ' ')
        |      AS toks2
        |  FROM documents WHERE doc_id % 10 = 0),
        |sh AS (
        |  SELECT doc_id,
        |    ${shingleSql("toks")} AS s0,
        |    ${shingleSql("toks1")} AS s1,
        |    ${shingleSql("toks2")} AS s2
        |  FROM fam),
        |j AS (
        |  SELECT doc_id,
        |    ${jacSql("s0", "s1")} AS j01,
        |    ${jacSql("s1", "s2")} AS j12,
        |    ${jacSql("s0", "s2")} AS j02
        |  FROM sh),
        |edges AS (
        |  SELECT doc_id AS src, doc_id + 1000000 AS dst FROM j
        |  WHERE j01 >= 0.5
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id + 2000000 FROM j WHERE j12 >= 0.5
        |  UNION ALL
        |  SELECT doc_id, doc_id + 2000000 FROM j WHERE j02 >= 0.5),
        |sym AS (
        |  SELECT src, dst FROM edges
        |  UNION SELECT dst AS src, src AS dst FROM edges),
        |nodes AS (
        |  SELECT unnest([doc_id, doc_id + 1000000, doc_id + 2000000]) AS id
        |  FROM fam),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT s.dst, reach.r FROM sym s JOIN reach ON s.src = reach.id)
        |SELECT id AS doc_id, min(r) AS component
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "q_split_cluster_safe" ->
      s"""WITH RECURSIVE
        |fam AS (
        |  SELECT doc_id, $toksSql AS toks,
        |    string_split(array_to_string(($toksSql)[3:], ' '), ' ')
        |      AS toks1,
        |    string_split(array_to_string(($toksSql)[5:], ' '), ' ')
        |      AS toks2
        |  FROM documents WHERE doc_id % 10 = 0),
        |sh AS (
        |  SELECT doc_id,
        |    ${shingleSql("toks")} AS s0,
        |    ${shingleSql("toks1")} AS s1,
        |    ${shingleSql("toks2")} AS s2
        |  FROM fam),
        |j AS (
        |  SELECT doc_id,
        |    ${jacSql("s0", "s1")} AS j01,
        |    ${jacSql("s1", "s2")} AS j12,
        |    ${jacSql("s0", "s2")} AS j02
        |  FROM sh),
        |edges AS (
        |  SELECT doc_id AS src, doc_id + 1000000 AS dst FROM j
        |  WHERE j01 >= 0.5
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id + 2000000 FROM j WHERE j12 >= 0.5
        |  UNION ALL
        |  SELECT doc_id, doc_id + 2000000 FROM j WHERE j02 >= 0.5),
        |sym AS (
        |  SELECT src, dst FROM edges
        |  UNION SELECT dst AS src, src AS dst FROM edges),
        |nodes AS (
        |  SELECT unnest([doc_id, doc_id + 1000000, doc_id + 2000000]) AS id
        |  FROM fam),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT s.dst, reach.r FROM sym s JOIN reach ON s.src = reach.id)
        |,comp AS (
        |  SELECT id, min(r) AS component FROM reach GROUP BY id),
        |a AS (
        |  SELECT component,
        |    CASE WHEN substr(md5(component::VARCHAR || ':csplit'), 1, 8)
        |              < 'e6666666' THEN 'train'
        |         WHEN substr(md5(component::VARCHAR || ':csplit'), 1, 8)
        |              < 'f3333333' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM comp)
        |SELECT split, count(*) AS n_docs,
        |  count(DISTINCT component) AS n_clusters
        |FROM a GROUP BY 1 ORDER BY split""".stripMargin,
    "q_decontaminate" ->
      s"""WITH bench AS (
        |  SELECT doc_id AS b_id, $toksSql AS b_toks
        |  FROM documents WHERE doc_id < 20),
        |bgrams AS (
        |  SELECT DISTINCT unnest(${shingleSql("b_toks")}) AS gram
        |  FROM bench),
        |corpus AS (
        |  SELECT c.doc_id,
        |    c.text || ' ' || array_to_string(b.b_toks[1:8], ' ') AS text
        |  FROM documents c JOIN bench b ON b.b_id = c.doc_id % 20
        |  WHERE c.doc_id >= 20 AND c.doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id >= 20 AND doc_id % 7 <> 0),
        |cg AS (
        |  SELECT doc_id, unnest(list_distinct(${shingleSql(toksSql)}))
        |    AS gram
        |  FROM corpus)
        |SELECT doc_id, count(*) AS n_hits
        |FROM cg JOIN bgrams USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_multimodal_frames" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN strlen(text) > 2048 THEN substr(text, 1, 2048)
        |         ELSE text END AS content
        |  FROM documents),
        |f AS (
        |  SELECT media_id, content,
        |    CAST(ceil(strlen(content) / 256.0) AS INT) AS n_frames
        |  FROM media WHERE strlen(content) > 0),
        |fx AS (
        |  SELECT media_id, content,
        |    CAST(unnest(list_filter(generate_series(0, n_frames - 1),
        |                            i -> i % 4 = 0)) AS INT) AS frame_idx
        |  FROM f)
        |SELECT media_id, frame_idx,
        |  CAST(strlen(substr(content, frame_idx * 256 + 1, 256))
        |       AS INT) AS frame_len,
        |  md5(substr(content, frame_idx * 256 + 1, 256)) AS frame_md5
        |FROM fx ORDER BY media_id, frame_idx""".stripMargin,
    "q_sample_group" ->
      """WITH r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 8))::BIGINT,
        |      doc_id) AS rk
        |  FROM documents)
        |SELECT lang, CAST(rk AS INT) AS rk, doc_id FROM r WHERE rk <= 20
        |ORDER BY lang, rk""".stripMargin,
    "q_embed_centroid" ->
      """SELECT label, CAST(pos - 1 AS BIGINT) AS pos,
        |  round(avg(CAST(e AS DOUBLE)), 6) AS c
        |FROM (SELECT label, unnest(embedding) AS e,
        |             generate_subscripts(embedding, 1) AS pos
        |      FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q_embed_quantize" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS ma
        |  FROM embeddings)
        |SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
        |  round(ma, 6) AS max_abs,
        |  '[' || array_to_string(list_transform(embedding,
        |    x -> CAST(CAST(CASE WHEN ma = 0 THEN 0
        |                   ELSE round(CAST(x AS DOUBLE) * 127 / ma)
        |              END AS TINYINT) AS VARCHAR)), ',') || ']' AS q8
        |FROM m ORDER BY vec_id""".stripMargin,
    "q_pack_sequences" -> {
      val ntok =
        "len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))"
      s"""WITH t AS (
        |  SELECT doc_id, $ntok AS n_tokens,
        |    ('0x' || substr(md5(doc_id::VARCHAR || ':13'), 1, 8))::BIGINT
        |      % 8 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT shard, doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens, 0) AS start_off
        |  FROM t)
        |SELECT shard, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(floor(start_off / 2048) AS BIGINT) AS pack_id,
        |  CAST(start_off % 2048 AS BIGINT) AS offset_in_pack
        |FROM c ORDER BY shard, doc_id""".stripMargin
    },
    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':42'), 1, 8))::BIGINT
        |        % 10000 <
        |      (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |                 WHEN 'es' THEN 0.25 WHEN 'zh' THEN 0.1
        |                 WHEN 'fr' THEN 0.1 ELSE 0.05 END) * 10000
        |ORDER BY doc_id""".stripMargin,
    "q_mix_upsample" ->
      """SELECT doc_id, lang,
        |  CAST(unnest(generate_series(1,
        |    CASE lang WHEN 'en' THEN 3 WHEN 'de' THEN 2 ELSE 1 END))
        |    AS INT) AS copy_idx
        |FROM documents WHERE doc_id < 100
        |ORDER BY doc_id, copy_idx""".stripMargin,
    "q_fingerprint_rolling" ->
      s"""SELECT doc_id,
        |  list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform($toksSql,
        |        t -> (ascii(t) * 131 + length(t)) % 1000000007)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rh
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram" ->
      s"""WITH t AS (
        |  -- toks2 round-trips through join+split (mirroring the Spark
        |  -- side, where the perturbed text is re-tokenized): a <3-token
        |  -- doc yields [''] on both engines, not []
        |  SELECT doc_id, $toksSql AS toks,
        |    string_split(array_to_string(($toksSql)[3:], ' '), ' ') AS toks2
        |  FROM documents WHERE doc_id % 5 = 0),
        |s AS (
        |  SELECT doc_id, toks, toks2,
        |    ${shingleSql("toks")} AS sh1,
        |    ${shingleSql("toks2")} AS sh2
        |  FROM t)
        |SELECT doc_id,
        |  round(CAST(len(list_intersect(list_distinct(sh1),
        |                                list_distinct(sh2))) AS DOUBLE)
        |        / len(list_distinct(list_concat(sh1, sh2))), 6) AS jaccard5,
        |  round(CAST(len(list_intersect(list_distinct(toks),
        |                                list_distinct(toks2))) AS DOUBLE)
        |        / len(list_distinct(list_concat(toks, toks2))), 6)
        |    AS jaccard_tok
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_text_perplexity" ->
      s"""WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf
        |  FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
        |  GROUP BY doc_id, tok),
        |vocab AS (SELECT tok, sum(tf) AS cnt FROM tf GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM vocab)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
        |  round(-sum(CAST(tf AS DOUBLE) * ln(CAST(cnt AS DOUBLE) / n_total))
        |        / sum(tf), 4) AS nll
        |FROM tf JOIN vocab USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      s"""WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM (
        |    SELECT doc_id, unnest($toksSql) AS tok FROM documents)
        |  GROUP BY doc_id, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tok,
        |    round(tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) + 1), 4)
        |      AS tfidf
        |  FROM tf JOIN df USING (tok), n
        |  WHERE doc_id < 10),
        |r AS (
        |  SELECT doc_id, tok, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, tok) AS rk
        |  FROM scored)
        |SELECT doc_id, CAST(rk AS INT) AS rk, tok, tfidf
        |FROM r WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin,
    "q_text_scrub" -> {
      val dirty = "concat('contact user', doc_id::VARCHAR, " +
        "'@mail.example.com or http://ex', doc_id::VARCHAR, '.com/x ', text)"
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val urlRe = "https?://[^ ]+"
      s"""SELECT doc_id,
        |  CAST(len(regexp_extract_all($dirty, '$emailRe')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all($dirty, '$urlRe')) AS INT) AS n_urls,
        |  substr(regexp_replace(regexp_replace($dirty, '$urlRe', '<URL>',
        |           'g'), '$emailRe', '<EMAIL>', 'g'), 1, 60)
        |    AS scrubbed_head
        |FROM documents ORDER BY doc_id""".stripMargin
    },
    "q_heavy_hitters" ->
      """SELECT lang, CAST(rk AS INT) AS rk, tok, n_tok FROM (
        |  SELECT lang, tok, count(*) AS n_tok,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY count(*) DESC, tok) AS rk
        |  FROM (
        |    SELECT lang,
        |      unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
        |        AS tok
        |    FROM documents)
        |  GROUP BY lang, tok)
        |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,
    // per-column profile: DuckDB mirrors the string-image numeric range
    // (each engine parses its OWN image — same value set, same min/max)
    "q_profile" -> ProfileCols.map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
        |  count(*) - count($c) AS n_nulls,
        |  count(DISTINCT $c) AS n_distinct,
        |  round(min(TRY_CAST(CAST($c AS VARCHAR) AS DOUBLE)), 4) AS min_num,
        |  round(max(TRY_CAST(CAST($c AS VARCHAR) AS DOUBLE)), 4) AS max_num
        |FROM orders""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    // exact pairwise bigram overlap: every (a < b) source pair appears,
    // zero-overlap pairs included (Spark emits them with n_common = 0)
    "q_overlap_theta" ->
      """WITH toks AS (
        |  SELECT source,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')
        |      AS t
        |  FROM documents),
        |bg AS (
        |  SELECT DISTINCT source, t[i] || ' ' || t[i+1] AS bg
        |  FROM (SELECT source, t, unnest(range(1, len(t))) AS i
        |        FROM toks)),
        |n AS (SELECT source, count(*) AS n_bg FROM bg GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b
        |  FROM n a, n b WHERE a.source < b.source),
        |common AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        |  FROM bg a JOIN bg b USING (bg) WHERE a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b,
        |  coalesce(c.n_common, 0) AS n_common,
        |  n.n_bg - coalesce(c.n_common, 0) AS n_only_a
        |FROM pairs p
        |LEFT JOIN common c ON c.src_a = p.src_a AND c.src_b = p.src_b
        |JOIN n ON n.source = p.src_a
        |ORDER BY p.src_a, p.src_b""".stripMargin,
    "q_token_freq" ->
      """SELECT tok, count(*) AS doc_freq FROM (
        |  SELECT DISTINCT doc_id,
        |    unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
        |      AS tok
        |  FROM documents)
        |GROUP BY tok ORDER BY doc_freq DESC, tok LIMIT 50""".stripMargin,
    "q_dedup_exact" ->
      s"""SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT md5($normText)) AS n_uniq
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_fingerprint" ->
      s"""SELECT doc_id, md5($normText) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_embedding" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |FROM c a, c b WHERE a.vec_id < b.vec_id
        |  AND round(list_cosine_similarity(a.v, b.v), 6) > 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "q_sim_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT q_id, vec_id AS neighbor_id,
        |        list_cosine_similarity(qv, v) AS cos,
        |        row_number() OVER (PARTITION BY q_id
        |          ORDER BY list_cosine_similarity(qv, v) DESC, vec_id)
        |          AS rk
        |      FROM q, c WHERE vec_id <> q_id)
        |SELECT q_id, CAST(rk AS INT) AS rk, neighbor_id,
        |  round(cos, 6) AS cos
        |FROM s WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin,
    "q_text_stats" ->
      s"""SELECT doc_id,
        |  CAST(len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS INT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe,
        |  round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
        |    / nullif(len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')), 0), 6) AS avg_tok_len,
        |  round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        |    / nullif(length(text), 0), 6) AS alpha_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_entropy" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang, unnest($toksSql) AS tok FROM documents),
        |c AS (
        |  SELECT doc_id, lang, tok, count(*) AS c
        |  FROM t GROUP BY 1, 2, 3),
        |e AS (
        |  SELECT doc_id, lang,
        |    ln(sum(c)) - sum(c * ln(c)) / sum(c) AS ent
        |  FROM c GROUP BY 1, 2)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(ent), 4) AS avg_entropy,
        |  CAST(sum(CASE WHEN ent < 3.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_diversity
        |FROM e GROUP BY 1 ORDER BY lang""".stripMargin,
    "q_text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, len(t) AS n_tok, len(list_distinct(t)) AS n_utok, t
        |  FROM toks),
        |bg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM base)),
        |cnt AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bg,
        |    count(*) AS n_ubg, max(c) AS top_bg_c
        |  FROM cnt GROUP BY doc_id)
        |SELECT b.doc_id, n_tok, n_utok,
        |  coalesce(n_bg, 0) AS n_bg, coalesce(n_ubg, 0) AS n_ubg,
        |  coalesce(top_bg_c, 0) AS top_bg_c,
        |  ((n_tok - n_utok) * 10 > n_tok * 3
        |    OR coalesce(top_bg_c, 0) * 50 > coalesce(n_bg, 0) * 9)
        |    AS gopher_drop
        |FROM base b LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_text_lang" -> {
      val en = langScoreSql("en"); val de = langScoreSql("de")
      val es = langScoreSql("es"); val fr = langScoreSql("fr")
      s"""WITH scored AS (
        |  SELECT lang, $en AS s_en, $de AS s_de, $es AS s_es, $fr AS s_fr,
        |    greatest($en, $de, $es, $fr) AS best
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN best > 0 AND s_en = best THEN 'en'
        |       WHEN best > 0 AND s_de = best THEN 'de'
        |       WHEN best > 0 AND s_es = best THEN 'es'
        |       WHEN best > 0 AND s_fr = best THEN 'fr'
        |       ELSE 'und' END AS lang_pred,
        |  count(*) AS n
        |FROM scored GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin
    },
    "q_text_quality" -> {
      val ntok = "len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))"
      val stopHits = Seq("the", "a", "and", "of", "to", "in", "is", "that")
        .map(hitsSql).mkString("(", " + ", ")")
      s"""SELECT doc_id,
        |  round(least(CAST($ntok AS DOUBLE) / 50.0, 1.0) * 0.4 +
        |    coalesce(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        |      / nullif(length(text), 0), 0.0) * 0.4 +
        |    least(coalesce(CAST($stopHits AS DOUBLE) / nullif($ntok, 0), 0.0)
        |      * 4.0, 1.0) * 0.2, 6) AS quality,
        |  round(CAST($stopHits AS DOUBLE) / nullif($ntok, 0), 6)
        |    AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin
    })
}
