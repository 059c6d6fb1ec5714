package graft.pipeline

import graft.SparkSpec
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Dedup + similarity + text operators: recall against planted/exact
  * ground truth. */
class PipelineSpec extends SparkSpec {

  lazy val docs = graft.Tables.load(spark, sfDir, "documents").cache()
  lazy val emb = graft.Tables.load(spark, sfDir, "embeddings").cache()

  test("exact dedup groups identical normalized content") {
    val dup = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 10000, // same text, different id
                         concat(col("text"), lit("  ")))) // whitespace-only change
    val groups = Dedup.exactDedup(dup, "doc_id", "text")
    assert(groups.count() == docs.count())            // one group per content
    assert(groups.filter(col("n_copies") === 2).count() == docs.count())
    assert(groups.filter(col("keep_id") >= 10000).count() == 0) // keeps originals
  }

  test("from-tokens signature paths equal the text-column paths") {
    // the shared-corpus formulation (one pinned tokenization, see
    // ops.SharedCorpus) must be value-identical to tokenizing per query
    val tok = docs.select(col("doc_id"),
                          TextAnalysis.tokens(col("text")).as("toks"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSet
    assert(rows(Dedup.minhashSignaturesFromTokens(tok, "doc_id", "toks",
                                                  k = 8, nGram = 5)) ==
             rows(Dedup.minhashSignatures(docs, "doc_id", "text",
                                          k = 8, nGram = 5)),
      "minhash signatures diverge between token-array and text paths")
    assert(rows(Dedup.simhashSignaturesFromTokens(tok, "doc_id", "toks")) ==
             rows(Dedup.simhashSignatures(docs, "doc_id", "text")),
      "simhash signatures diverge between token-array and text paths")
    // the PRE-HASHED path (one shared per-token hash pass, see
    // SharedCorpus.docsTokHash) must also be value-identical — including
    // a token SLICE applied in hash domain (hash-then-slice ==
    // slice-then-hash, the planted-variant reuse minhashSigs relies on)
    val th = tok.select(col("doc_id"),
                        Dedup.tokenHashes(col("toks")).as("th"))
    assert(rows(Dedup.minhashSignaturesFromTokenHashes(th, "doc_id", "th",
                                                       k = 8, nGram = 5)) ==
             rows(Dedup.minhashSignatures(docs, "doc_id", "text",
                                          k = 8, nGram = 5)),
      "minhash signatures diverge between pre-hashed and text paths")
    assert(rows(Dedup.simhashSignaturesFromTokenHashes(th, "doc_id", "th")) ==
             rows(Dedup.simhashSignatures(docs, "doc_id", "text")),
      "simhash signatures diverge between pre-hashed and text paths")
    val slicedHash = th.select(col("doc_id"),
      slice(col("th"), lit(3), size(col("th"))).as("th"))
    val hashedSlice = tok.select(col("doc_id"),
      Dedup.tokenHashes(slice(col("toks"), lit(3), size(col("toks"))))
        .as("th"))
    assert(rows(Dedup.minhashSignaturesFromTokenHashes(slicedHash,
                  "doc_id", "th", k = 8, nGram = 5)) ==
             rows(Dedup.minhashSignaturesFromTokenHashes(hashedSlice,
                  "doc_id", "th", k = 8, nGram = 5)),
      "hash-then-slice != slice-then-hash for the variant corpus")
    // jaccard: token slices (the perturbed-corpus shape) vs re-tokenized
    // space-joins of the same slices
    val ta = col("toks")
    val tb = slice(col("toks"), lit(3), size(col("toks")))
    val viaTok = tok.select(col("doc_id"),
      round(Dedup.ngramJaccardFromTokens(ta, tb, 5), 6).as("j"))
    val viaText = docs.select(col("doc_id"),
      round(Dedup.ngramJaccard(col("text"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), lit(3),
          size(TextAnalysis.tokens(col("text"))))), 5), 6).as("j"))
    assert(rows(viaTok) == rows(viaText),
      "ngram jaccard diverges between token-array and text paths")
  }

  test("minhash LSH recovers planted near-duplicates (full recall here)") {
    val planted = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), lit(3),
          size(TextAnalysis.tokens(col("text"))))).as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(planted)
    val cand = Dedup.lshCandidatePairs(corpus, "doc_id", "text", b = 16, r = 2)
    val plantedFound = cand
      .filter(col("id_b") === col("id_a") + 10000 && col("id_a") % 5 === 0)
      .count()
    assert(plantedFound == planted.count(),
      s"found $plantedFound of ${planted.count()} planted pairs")
  }

  test("ngram jaccard: identical=1, disjoint=0, planted pair high") {
    val df = spark.sql(
      """SELECT 'a b c d e f g' AS ta, 'a b c d e f g' AS tb
        |UNION ALL SELECT 'a b c d e f g', 'q r s t u v w'
        |UNION ALL SELECT 'a b c d e f g h i j', 'c d e f g h i j'""".stripMargin)
    val j = df.select(round(Dedup.ngramJaccard(col("ta"), col("tb"), 3), 4)
      .as("j")).collect().map(_.getDouble(0))
    assert(j(0) == 1.0)
    assert(j(1) == 0.0)
    assert(j(2) > 0.7)
  }

  test("simhash: identical texts collide, perturbed texts are close") {
    val sig = docs.limit(50).select(col("doc_id"),
      Dedup.simhash64(col("text")).as("s1"),
      Dedup.simhash64(concat_ws(" ",
        slice(TextAnalysis.tokens(col("text")), lit(2),
          size(TextAnalysis.tokens(col("text")))))).as("s2"))
    val self = sig.select(Dedup.hamming64(col("s1"), col("s1")).as("h"))
    assert(self.filter(col("h") =!= 0).count() == 0)
    val near = sig.select(Dedup.hamming64(col("s1"), col("s2")).as("h"))
    // dropping one token should flip few bits on average
    assert(near.agg(avg(col("h"))).head().getDouble(0) < 16.0)
  }

  test("simhash candidates: FULL recall at the requested radius (planted Hamming 1..6)") {
    // planted pairs at exact Hamming distances 1..6, with flipped bits
    // SPREAD across the old 4x16-bit chunks — distance-4..6 pairs sharing
    // no 16-bit chunk are exactly the ones a fixed 4-chunk split drops.
    val rnd = new scala.util.Random(7)
    val base = Array.fill(20)(rnd.nextLong())
    // distance d pair for base(i): flip d bits at positions spread over
    // the full 64-bit range (17*k mod 64 visits all four 16-bit chunks)
    val rows = base.zipWithIndex.flatMap { case (sig, i) =>
      val d = (i % 6) + 1
      val flipped = (0 until d).foldLeft(sig)((s, k) => s ^ (1L << ((17 * k + i) % 64)))
      Seq((i.toLong * 2, sig), (i.toLong * 2 + 1, flipped))
    }
    val sigs = spark.createDataFrame(rows.toSeq).toDF("id", "sig")
    val got = Dedup.simhashCandidatesFromSigs(sigs, maxHamming = 6)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair must be found (pigeonhole guarantees it)
    base.indices.foreach { i =>
      assert(got.contains((i.toLong * 2, i.toLong * 2 + 1)),
        s"planted pair at distance ${(i % 6) + 1} (ids ${i * 2},${i * 2 + 1}) missed")
    }
    // and nothing beyond the radius: verify against brute force
    val a = sigs.as("a"); val b = sigs.as("b")
    val brute = a.join(b, col("a.id") < col("b.id"))
      .filter(Dedup.hamming64(col("a.sig"), col("b.sig")) <= 6)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, "candidates != brute-force pairs within radius")
  }

  test("q_dedup_simhash finds every pair within Hamming 6 (vs brute force on real sigs)") {
    val sig = Dedup.simhashSignatures(docs, "doc_id", "text").cache()
    val a = sig.as("a"); val b = sig.as("b")
    val brute = a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              Dedup.hamming64(col("a.sig"), col("b.sig")).as("h"))
      .filter(col("h") <= 6)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.simhashCandidatesFromSigs(sig, maxHamming = 6)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"bucketed candidates (${got.size}) != brute force (${brute.size})")
  }

  test("embedding LSH near-dup: full recall on planted pairs vs exact baseline") {
    // plant near-dups the same way q_dedup_embedding_lsh does
    val perturbed = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
              concat(array(lit(0.0f)),
                     slice(col("embedding"), 2, 10000)).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(perturbed).cache()
    // exact baseline: all-pairs cosine >= 0.9
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .filter(graft.functions.VectorFunctions.cosine(col("va"), col("vb")) >= 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "no planted pairs above 0.9 — test corpus broken")
    val got = Dedup.embeddingNearDups(corpus, "vec_id", "embedding",
        dim = 64, minCosine = 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // no false positives possible (exact rerank); recall from 8x12 LSH
    assert(got.subsetOf(exact))
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.95, s"LSH embedding dedup recall $recall < 0.95 " +
      s"(${got.size}/${exact.size})")
  }

  test("connected components: chains merge, separate components stay apart") {
    // graph: chain 1-2-3-4, pair 10-11, triangle 20-21-22 (+ redundant edge)
    val edges = spark.createDataFrame(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))).toDF("src", "dst")
    val comps = Dedup.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
    assert(Seq(10L, 11L).forall(comps(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(comps(_) == 20L))
    assert(comps.size == 9)
    // unconverged loops must raise, not return garbage (localEdgeCap = 0:
    // the convergence guard lives on the distributed loop; the driver-
    // local fast path has no rounds — LocalCcSpec owns its contract)
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(edges, "src", "dst", maxIter = 1,
                                localEdgeCap = 0).collect()
    }
  }

  test("log-star components match min-label on a mixed graph") {
    // chain + pair + triangle (same fixture as the min-label test) plus a
    // deterministic pseudo-random tangle
    val tangle = (0 until 200).map(i => ((i * 7 + 3) % 97 + 100L,
                                         (i * 13 + 5) % 97 + 100L))
    val edges = spark.createDataFrame(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)) ++ tangle).toDF("src", "dst")
    val a = Dedup.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.connectedComponentsLogStar(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "log-star labeling diverges from min-label propagation")
  }

  test("log-star converges on a 300-long chain where min-label cannot") {
    // path graph 0-1-2-...-300: diameter 300. Min-label needs ~300 rounds
    // (its default maxIter raises); large-star/small-star needs O(log n).
    val chain = (0L until 300L).map(i => (i, i + 1))
    val edges = spark.createDataFrame(chain).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      // localEdgeCap = 0: pin the DISTRIBUTED loop's diameter guard
      Dedup.connectedComponents(edges, "src", "dst", maxIter = 10,
                                localEdgeCap = 0).collect()
    }
    val labels = Dedup.connectedComponentsLogStar(edges, "src", "dst",
        maxIter = 20, shufflePartitions = 8, localEdgeCap = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 301)
    assert(labels.forall(_._2 == 0L),
      "every chain node must label to the component minimum 0")
  }

  test("connected components never mutate the parent session's AQE conf") {
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key, "true")
    // poll from another thread WHILE the loop runs — the old in-place
    // toggle restored the value afterwards, invisible to a before/after
    // check but racing any concurrent query on the shared session
    @volatile var sawMutation = false
    @volatile var stop = false
    val probe = new Thread(() => {
      while (!stop) {
        if (spark.conf.get(key, "true") != before) sawMutation = true
        Thread.sleep(2)
      }
    })
    probe.start()
    try {
      val edges = spark.createDataFrame(
        Seq((1L, 2L), (2L, 3L), (10L, 11L))).toDF("src", "dst")
      assert(Dedup.connectedComponents(edges, "src", "dst").count() == 5)
    } finally { stop = true; probe.join() }
    assert(!sawMutation, s"parent session's $key was mutated mid-loop")
    assert(spark.conf.get(key, "true") == before)
  }

  test("q_dedup_clusters: transitive chains collapse into one component") {
    val out = graft.ops.PipelineQueries.queries("q_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byComp = out.groupBy(_._2)
    // every family member got a component, component is the min member id
    assert(out.forall { case (id, comp) => comp <= id })
    // at least one family chained 0-1-2 into a single 3-node component
    assert(byComp.values.exists(_.length >= 3),
      "no 3-node component — planted chains failed to merge")
    // components never span families (edges are within-family only)
    assert(out.forall { case (id, comp) => id % 1000000 == comp % 1000000 })
  }

  test("q_decontaminate flags every planted doc (plus any natural overlap)") {
    val out = graft.ops.PipelineQueries.queries("q_decontaminate")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = docs.filter(col("doc_id") >= 20 && col("doc_id") % 7 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every planted doc is flagged; the corpus also contains a handful of
    // NATURAL 5-gram overlaps with the benchmark slice (synthetic docs
    // reuse phrases) — those are genuine contamination and belong in the
    // result too, so containment, not equality
    assert(planted.subsetOf(out.keySet),
      s"missed planted docs: ${planted -- out.keySet}")
    // an 8-token planted snippet carries >= 3 distinct benchmark 5-grams
    assert(planted.forall(out(_) >= 3L),
      s"planted doc with suspiciously few hits")
  }

  test("ivfAssign: argmin matches a window-ranked reference and plans without Window") {
    import graft.functions.VectorFunctions.l2Distance
    val centroids = emb.filter(col("vec_id") % 25 === 0)
    val assigned = Similarity.ivfAssign(emb, centroids).cache()
    // reference: explicit row_number ranking (the shape we replaced)
    val cross = emb.join(
        broadcast(centroids.select(col("vec_id").as("centroid_id"),
                                   col("embedding").as("c_vec"))))
      .select(col("vec_id"), col("centroid_id"),
              l2Distance(col("embedding"), col("c_vec")).as("dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("dist"), col("centroid_id"))
    val ref = cross.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).select("vec_id", "centroid_id")
    assert(assigned.select("vec_id", "centroid_id")
      .exceptAll(ref).count() == 0)
    assert(ref.exceptAll(assigned.select("vec_id", "centroid_id"))
      .count() == 0)
    // the production plan must be an aggregate with MAP-SIDE PARTIALS
    // (shuffle bounded by |corpus|), not a window sort of corpus x C rows
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"ivfAssign plan contains a Window node:\n$plan")
    assert(plan.contains("partial_min_by"),
      s"ivfAssign plan has no partial (map-side) min_by aggregate:\n$plan")
  }

  test("LSH ANN achieves reasonable recall vs brute force top-10") {
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select(col("q_id"), col("neighbor_id"))
    val approx = Similarity.lshTopK(emb, queries, k = 10, dim = 64, planes = 2)
      .select(col("q_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("q_id", "neighbor_id")).count()
    val recall = hits.toDouble / exact.count()
    // 2 planes ≈ 1/4 of the corpus probed; cosine-correlated buckets push
    // recall well above the 25% random-probe floor
    assert(recall > 0.25, s"LSH recall $recall too low")
  }

  test("IVF ANN achieves reasonable recall vs brute force top-10") {
    val centroids = emb.filter(col("vec_id") % 25 === 0)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val assigned = Similarity.ivfAssign(emb, centroids)
    assert(assigned.count() == emb.count()) // every vector lands in one list
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select(col("q_id"), col("neighbor_id"))
    val approx = Similarity.ivfTopK(assigned, centroids, queries,
      k = 10, nprobe = 5)
      .select(col("q_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("q_id", "neighbor_id")).count()
    val recall = hits.toDouble / exact.count()
    assert(recall > 0.3, s"IVF recall $recall too low")
  }

  test("brute-force top-k: self excluded, scores sorted, k respected") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val topk = Similarity.bruteForceTopK(emb, queries, k = 5).cache()
    assert(topk.count() == 15)
    assert(topk.filter(col("q_id") === col("neighbor_id")).count() == 0)
    val monotone = topk.withColumn("prev",
      lag(col("cos"), 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy("rk")))
    assert(monotone.filter(col("prev") < col("cos")).count() == 0)
  }

  test("stratified sample is deterministic and hits target fractions") {
    val q = graft.ops.PipelineQueries.queries("q_sample_stratified")
    val s1 = q(spark, sfDir).collect().map(_.getLong(0)).toSeq
    val s2 = q(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2) // hash-based: identical across runs
    val sampled = q(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enFrac = sampled.getOrElse("en", 0L).toDouble / totals("en")
    assert(math.abs(enFrac - 0.5) < 0.2, s"en fraction $enFrac far from 0.5")
  }

  test("language id picks the language whose markers dominate") {
    val df = spark.sql(
      """SELECT 'the cat and the dog of the house' AS t
        |UNION ALL SELECT 'der hund und die katze ist hier und der vogel'
        |UNION ALL SELECT 'el gato que la casa el perro que la'
        |UNION ALL SELECT 'xyz abc qrs'""".stripMargin)
    val got = df.select(TextAnalysis.langId(col("t")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "de", "es", "und"))
  }

  test("token counts and fingerprints are whitespace-normalization invariant") {
    val df = spark.sql("SELECT 'a  b\tc' AS t UNION ALL SELECT ' a b c '")
    val n = df.select(TextAnalysis.tokenCount(col("t")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(n == Seq(3, 3))
    val fps = df.select(TextAnalysis.fingerprint(col("t")).as("f"))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1)
  }

  test("rolling token hash is order-sensitive, fingerprint is not") {
    val df = spark.sql("SELECT 'alpha beta gamma' AS t UNION ALL SELECT 'gamma beta alpha'")
    val rh = df.select(TextAnalysis.rollingTokenHash(col("t")).as("h"))
      .collect().map(_.getLong(0)).toSet
    assert(rh.size == 2)
  }

  test("tfidf: 5 ranked terms per doc, scores non-increasing, rare beats common") {
    val out = graft.ops.PipelineQueries.queries("q_tfidf")(spark, sfDir).cache()
    val perDoc = out.groupBy("doc_id").count().collect()
    assert(perDoc.nonEmpty && perDoc.forall(_.getLong(1) == 5))
    val bad = out.withColumn("prev", lag(col("tfidf"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("rk")))
      .filter(col("prev") < col("tfidf"))
    assert(bad.count() == 0)
    // idf direction: a corpus-unique term must outscore a same-tf term
    // that appears in every doc
    val probe = spark.createDataFrame(Seq(
      (1L, "unique_xyzzy common"), (2L, "common"), (3L, "common"))).toDF("doc_id", "text")
    val toks = probe.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = toks.join(dfreq, "tok")
      .withColumn("tfidf", col("tf") * (log(lit(4.0) / (col("df") + 1)) + 1))
      .filter(col("doc_id") === 1)
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Double]("tfidf")).toMap
    assert(scored("unique_xyzzy") > scored("common"))
  }

  test("mix upsample: copies match per-language weights") {
    val out = graft.ops.PipelineQueries.queries("q_mix_upsample")(spark, sfDir)
    val copies = out.groupBy("doc_id", "lang").count()
    assert(copies.filter(col("lang") === "en" && col("count") =!= 3).count() == 0)
    assert(copies.filter(col("lang") === "de" && col("count") =!= 2).count() == 0)
    assert(copies.filter(!col("lang").isin("en", "de") && col("count") =!= 1)
      .count() == 0)
  }

  test("text scrub redacts planted email and url") {
    val out = graft.ops.PipelineQueries.queries("q_text_scrub")(spark, sfDir)
      .cache()
    assert(out.filter(col("n_emails") < 1 || col("n_urls") < 1).count() == 0)
    assert(out.filter(!col("scrubbed_head").contains("<EMAIL>")).count() == 0)
    assert(out.filter(col("scrubbed_head").rlike("https?://")).count() == 0)
    assert(out.filter(col("scrubbed_head")
      .rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).count() == 0)
  }

  test("bloom decontamination: superset of exact hits, bounded FP overhead") {
    val exact = graft.ops.PipelineQueries.queries("q_decontaminate")(spark, sfDir)
      .withColumnRenamed("n_hits", "exact_hits").cache()
    val bloom = graft.ops.PipelineQueries.queries("q_decontaminate_bloom")(spark, sfDir)
      .withColumnRenamed("n_hits", "bloom_hits").cache()
    // no false negatives: every exactly-contaminated doc is flagged, and
    // the probabilistic hit count can only exceed the exact one
    val missed = exact.join(bloom, Seq("doc_id"), "left")
      .filter(col("bloom_hits").isNull ||
              col("bloom_hits") < col("exact_hits"))
    assert(missed.count() == 0,
      "bloom decontamination dropped exact hits (impossible for a bloom filter)")
    // false-positive overhead bounded (80k bits / ~5k grams -> tiny FP rate)
    assert(bloom.count() <= 2 * exact.count(),
      s"bloom flagged ${bloom.count()} docs vs ${exact.count()} exact — FP blowup")
  }

  test("HLL sketch union-merge equals one-pass sketch and tracks exact distinct") {
    val o = graft.Tables.load(spark, sfDir, "orders")
    // the gated query now serves the HYBRID face (exact distinct + the
    // within-10% claim); rebuild the raw unioned estimate here to assert
    // the tighter properties the hybrid face summarizes
    val merged = o.groupBy(col("o_orderstatus"),
                           month(col("o_orderdate")).as("m"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .groupBy(col("o_orderstatus"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("approx_cust"))
    val direct = o.groupBy(col("o_orderstatus"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey")))
        .as("direct_est"))
    // sketch union is lossless re-aggregation: merged == one-pass
    val diff = merged.join(direct, "o_orderstatus")
      .filter(col("approx_cust") =!= col("direct_est"))
    assert(diff.count() == 0,
      "per-month sketch union diverged from the one-pass sketch")
    val exact = o.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    val off = merged.join(exact, "o_orderstatus")
      .filter(abs(col("approx_cust") - col("n_exact")) >
              col("n_exact") * 0.05)
    assert(off.count() == 0, "HLL estimate off by more than 5%")
    // and the gated hybrid face holds its claim
    val face = graft.ops.PipelineQueries.queries("q_hll_mergeable")(spark, sfDir)
    assert(face.filter(!col("union_within_10pct")).count() == 0,
      "hybrid face's within-10pct claim is false")
  }

  test("KLL quantile sketch: exact count, rank-error bound, merge path sane") {
    import graft.functions.KllFunctions._
    val o = graft.Tables.load(spark, sfDir, "orders")
    val merged = graft.ops.PipelineQueries
      .queries("q_quantile_sketch")(spark, sfDir)
    // the sketch's seen-value count is exact (not an estimate)
    val exactN = o.groupBy(col("o_orderstatus"))
      .agg(count(col("o_totalprice")).as("n_exact"))
    assert(merged.join(exactN, "o_orderstatus")
      .filter(col("n") =!= col("n_exact")).count() == 0,
      "kll_count diverged from the exact row count through the merge")
    // KLL k=200 guarantees ~1.65% normalized rank error at 99%
    // confidence; assert each estimate lies between the EXACT quantiles
    // at q -/+ 3% rank (generous, so the randomized compaction path
    // cannot flake the suite)
    val eps = 0.03
    def b(q: Double, nm: String) = Seq(
      expr(s"percentile(o_totalprice, ${math.max(0, q - eps)})")
        .as(s"${nm}_lo"),
      expr(s"percentile(o_totalprice, ${math.min(1, q + eps)})")
        .as(s"${nm}_hi"))
    val bounds = o.groupBy(col("o_orderstatus"))
      .agg((b(0.5, "p50") ++ b(0.95, "p95") ++ b(0.99, "p99")).head,
           (b(0.5, "p50") ++ b(0.95, "p95") ++ b(0.99, "p99")).tail: _*)
    // the query now carries its own in-band booleans (the hybrid
    // oracle); every one must hold here too
    val viol = merged.filter(!col("p50_in_band") || !col("p95_in_band") ||
                             !col("p99_in_band"))
    assert(viol.count() == 0,
      s"KLL estimate outside the rank-error bound:\n${viol.collect()
        .mkString("\n")}")
    // per-month merge equals a direct one-pass sketch up to rank error:
    // the direct estimates must satisfy the SAME exact-quantile bounds
    val direct = o.groupBy(col("o_orderstatus"))
      .agg(kllSketchAgg(col("o_totalprice")).as("sk"))
      .select(col("o_orderstatus"),
              round(kllQuantile(col("sk"), lit(0.95)), 2).as("d95"))
    val dviol = direct.join(bounds, "o_orderstatus")
      .filter(col("d95") < col("p95_lo") || col("d95") > col("p95_hi"))
    assert(dviol.count() == 0, "direct one-pass sketch outside rank bound")
  }

  test("profiler: approx path matches exact counts, HLL-bounded distincts, same ranges") {
    import graft.ops.Profiler
    val o = graft.Tables.load(spark, sfDir, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority")
    val exact = Profiler.profile(o, cols, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profiler.profile(o, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == cols.toSet && approx.keySet == cols.toSet)
    for (c <- cols) {
      val (e, a) = (exact(c), approx(c))
      assert(e.getLong(1) == a.getLong(1), s"$c n_rows")      // n_rows
      assert(e.getLong(2) == a.getLong(2), s"$c n_nulls")     // n_nulls
      val (ed, ad) = (e.getLong(3), a.getLong(3))             // n_distinct
      assert(math.abs(ed - ad) <= math.max(2, 0.05 * ed),
        s"$c approx distinct $ad vs exact $ed beyond HLL bound")
      assert(e.get(4) == a.get(4) && e.get(5) == a.get(5),    // ranges
        s"$c numeric range diverged: $e vs $a")
    }
    // sanity on known shape: key column is unique and non-null
    val k = exact("o_orderkey")
    assert(k.getLong(2) == 0 && k.getLong(3) == k.getLong(1))
  }

  test("theta sketches: union==one-pass, planted set algebra exact, over-capacity bounded") {
    import graft.functions.ThetaFunctions._
    import spark.implicits._
    // planted sets (both under the 4096 nominal entries -> exact mode):
    // A = [0, 3000), B = [2000, 6000); ground truth |A∩B| = 1000,
    // |A\B| = 2000
    val a = (0L until 3000L).toDF("v")
      .select(col("v").cast("string").as("s"), (col("v") % 4).as("shard"))
    val b = (2000L until 6000L).toDF("v")
      .select(col("v").cast("string").as("s"))
    // sharded build + union-agg rollup == one-pass sketch (mergeability)
    val sharded = a.groupBy(col("shard")).agg(thetaSketchAgg(col("s")).as("sk"))
    val viaUnion = sharded
      .agg(thetaEstimate(thetaUnionAgg(col("sk"))).as("est"))
      .head.getDouble(0)
    val onePassA = a.agg(thetaSketchAgg(col("s")).as("sk"))
      .select(thetaEstimate(col("sk")).as("est"), col("sk"))
      .head
    assert(viaUnion == 3000.0 && onePassA.getDouble(0) == 3000.0,
      s"exact-mode estimates drifted: union=$viaUnion one=$onePassA")
    // intersection / difference of exact sketches are exact
    val skA = a.agg(thetaSketchAgg(col("s")).as("sk_a"))
    val skB = b.agg(thetaSketchAgg(col("s")).as("sk_b"))
    val ops = skA.crossJoin(skB).select(
      thetaEstimate(thetaIntersect(col("sk_a"), col("sk_b"))).as("i"),
      thetaEstimate(thetaANotB(col("sk_a"), col("sk_b"))).as("d"))
      .head
    assert(ops.getDouble(0) == 1000.0 && ops.getDouble(1) == 2000.0,
      s"planted set algebra diverged: $ops")
    // over-capacity (lgK=4 -> 16 nominal entries, 10k distinct): the
    // exact count must lie inside the 3-sigma confidence bounds and the
    // estimate in a loose relative band (theta hashing is deterministic,
    // so this is reproducible, not flaky)
    val big = (0L until 10000L).toDF("v").select(col("v").cast("string").as("s"))
    val est = big.agg(thetaSketchAgg(col("s"), 4).as("sk"))
      .select(thetaEstimate(col("sk")).as("e"),
              thetaLb(col("sk"), 3).as("lb"), thetaUb(col("sk"), 3).as("ub"))
      .head
    assert(est.getDouble(1) <= 10000.0 && 10000.0 <= est.getDouble(2),
      s"exact count outside 3-sigma bounds: $est")
    assert(math.abs(est.getDouble(0) - 10000.0) / 10000.0 < 0.75,
      s"over-capacity estimate wildly off: $est")
    // the SQL surface resolves end-to-end (exact-mode set -> exact)
    org.apache.spark.sql.graft.bridge.installGraft(spark)
    a.createOrReplaceTempView("theta_probe")
    val sql = spark.sql(
      "SELECT theta_estimate(theta_sketch_agg(s)) FROM theta_probe")
      .head.getDouble(0)
    assert(sql == 3000.0, s"SQL-surface estimate: $sql")
  }

  test("k-means IVF: deterministic centroids, full assignment, recall vs brute force") {
    import graft.similarity.Similarity
    val centroids = Similarity.kmeansCentroids(emb, k = 8, maxIter = 5)
    assert(centroids.count() == 8)
    // same seed + same data -> identical centers (Lloyd's is deterministic
    // given init, and kmeans|| init is seeded)
    val again = Similarity.kmeansCentroids(emb, k = 8, maxIter = 5)
    assert(centroids.exceptAll(again).count() == 0 &&
           again.exceptAll(centroids).count() == 0)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val assigned = Similarity.ivfAssign(emb, centroids)
    assert(assigned.count() == emb.count()) // every vector in exactly one list
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("q_id", "neighbor_id")
    val approx = Similarity.ivfTopK(assigned, centroids, queries,
        k = 10, nprobe = 3)
      .select("q_id", "neighbor_id")
    val recall = exact.join(approx, Seq("q_id", "neighbor_id")).count()
      .toDouble / exact.count()
    // nprobe 3 of 8 trained lists; cosine-correlated assignment must beat
    // the 3/8 random-probe floor
    assert(recall > 0.375, s"k-means IVF recall $recall too low")
  }

  test("q_text_perplexity: hand-computed NLL on a planted two-doc corpus") {
    // corpus: "a a b" and "a b c" -> counts a=3 b=2 c=1, N=6
    // nll(d1) = -(2 ln(3/6) + ln(2/6)) / 3 ; nll(d2) = -(ln(3/6)+ln(2/6)+ln(1/6)) / 3
    import spark.implicits._
    val tiny = Seq((0L, "a a b"), (1L, "a b c")).toDF("doc_id", "text")
    val tf = tiny.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("n_total"))
    val out = tf.join(vocab, "tok").crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(round(-sum(col("tf").cast("double") *
                      log(col("cnt").cast("double") / col("n_total"))) /
                   sum(col("tf")), 4).as("nll"))
      .orderBy(col("doc_id")).collect()
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val e1 = r4(-(2 * math.log(3.0 / 6) + math.log(2.0 / 6)) / 3)
    val e2 = r4(-(math.log(3.0 / 6) + math.log(2.0 / 6) + math.log(1.0 / 6)) / 3)
    assert(out(0).getDouble(1) == e1 && out(1).getDouble(1) == e2)
    // and on the real corpus: every score strictly positive and finite
    val real = graft.ops.PipelineQueries.queries("q_text_perplexity")(spark, sfDir)
    assert(real.filter(col("nll") <= 0 || col("nll").isNull ||
                       col("nll") === Double.PositiveInfinity).count() == 0)
    assert(real.count() == docs.count())
  }

  test("q_embed_centroid: one row per (label, dim), components inside data range") {
    val out = graft.ops.PipelineQueries.queries("q_embed_centroid")(spark, sfDir)
      .cache()
    val nLabels = emb.select("label").distinct().count()
    assert(out.count() == nLabels * 64)
    val comp = emb.select(explode(col("embedding")).as("e"))
      .agg(min(col("e")).as("lo"), max(col("e")).as("hi")).collect()(0)
    val (lo, hi) = (comp.getFloat(0).toDouble, comp.getFloat(1).toDouble)
    assert(out.filter(col("c") < lo || col("c") > hi).count() == 0)
  }

  test("q_dedup_ngram: perturbed-self pairs keep high, in-range jaccard") {
    val out = graft.ops.PipelineQueries.queries("q_dedup_ngram")(spark, sfDir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("jaccard5") <= 0 || col("jaccard5") > 1 ||
                      col("jaccard_tok") <= 0 || col("jaccard_tok") > 1)
      .count() == 0)
    // a doc minus its first two tokens overlaps itself heavily
    val avg = out.agg(org.apache.spark.sql.functions.avg("jaccard5"))
      .collect()(0).getDouble(0)
    assert(avg > 0.5, s"mean shingle jaccard $avg unexpectedly low")
  }

  test("exact all-pairs kernels are corpus-size guarded, LSH path named") {
    import graft.dedup.Dedup
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    // under the bound: passthrough, frame unchanged
    assert(Dedup.requireAllPairsBound(e, "t", "lsh-path", bound = 100000)
      eq e)
    // over the bound: loud, and the error names the scale path
    val ex = intercept[IllegalArgumentException] {
      Dedup.requireAllPairsBound(e, "q_test_kernel", "q_test_lsh",
                                 bound = 10)
    }
    assert(ex.getMessage.contains("q_test_kernel") &&
           ex.getMessage.contains("q_test_lsh") &&
           ex.getMessage.contains("O(n"),
      s"guard message unhelpful: ${ex.getMessage}")
  }

  test("tokenEntropy: planted closed forms and parity with explode derivation") {
    import spark.implicits._
    import graft.text.TextAnalysis
    // closed forms: uniform {1/2,1/2} -> ln 2; single token -> 0;
    // all-unique k tokens -> ln k; {2/4, 1/4, 1/4} -> 1.5 ln 2
    val planted = Seq(
      (1L, "a a b b", math.log(2)),
      (2L, "only", 0.0),
      (3L, (1 to 5000).map(i => s"t$i").mkString(" "), math.log(5000)),
      (4L, "x x y z", 1.5 * math.log(2)))
    val got = planted.map { case (id, t, _) => (id, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokenEntropy(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    planted.foreach { case (id, _, want) =>
      assert(math.abs(got(id) - want) < 1e-9,
        s"doc $id: entropy ${got(id)} != $want") }
    // sf corpus: the scan-side fold equals the independent
    // explode-and-count derivation doc-for-doc
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val fold = docs.select(col("doc_id"),
      TextAnalysis.tokenEntropy(col("text")).as("e"))
    val heavy = docs
      .select(col("doc_id"),
              explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((log(sum(col("c"))) -
             sum(col("c") * log(col("c"))) / sum(col("c"))).as("h"))
    val diff = fold.join(heavy, "doc_id")
      .filter(abs(col("e") - col("h")) > 1e-9)
    assert(diff.isEmpty,
      s"entropy fold mismatch: ${diff.head(3).mkString(", ")}")
  }
}
