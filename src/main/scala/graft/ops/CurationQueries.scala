package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.dedup.Dedup
import graft.functions.VectorFunctions
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Second wave of LLM-data-pipeline operators (SURVEY.md §2.3 extension
  * surface): corpus curation — segment-level boilerplate dedup,
  * temperature-weighted source mixing, a C4/Gopher-style filter funnel,
  * bigram-LM scoring — plus radius similarity search and embedding
  * whitening. All six are engine-portable by construction (md5-derived
  * hashes, integer fixed-point emits), so every one is oracle-exact
  * against DuckDB — no rows-only entries in this module. */
object CurationQueries {

  private def docs(s: SparkSession, dir: String) =
    graft.Tables.ensureParallelism(load(s, dir, "documents"))
  private def emb(s: SparkSession, dir: String) =
    graft.Tables.ensureParallelism(load(s, dir, "embeddings"))

  /** Engine-portable 32-bit hash (same construction as PipelineQueries:
    * md5 hex prefix as integer) — reproducible outside Spark. */
  private def portableHash(key: Column, seed: Int) =
    conv(substring(md5(concat(key.cast("string"), lit(s":$seed"))), 1, 8),
         16, 10).cast("long")

  /** 10-token boilerplate planted into every third doc — segment-level
    * dedup must find and strip it (the corpus itself is word salad with
    * no cross-doc repeated long segments). */
  private val Boilerplate =
    "subscribe now to continue reading this free article online today"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CCNet-style segment-level dedup (boilerplate removal): chunk each
    // doc into consecutive 10-token segments, drop every segment whose
    // fingerprint occurs in >= 2 distinct docs, reassemble the remainder.
    // Scale shape: the duplicate-counting shuffle carries (md5, doc_id)
    // digests only — never segment text; the dup-fingerprint set (the
    // boilerplate segments of the corpus) is small by nature, so it
    // broadcasts and the keep-filter is a scan-side anti join. One
    // ordinary (doc_id) shuffle rebuilds the cleaned text.
    "q_dedup_segments" -> ((s, dir) => {
      val dirty = when(col("doc_id") % 3 === 0,
        concat(lit(Boilerplate), lit(" "), col("text"))).otherwise(col("text"))
      val toks = TextAnalysis.tokens(col("txt"))
      val nSeg = ceil(size(toks) / lit(10.0)).cast("int")
      // guard the 0-token doc: sequence(0, -1) yields the DESCENDING
      // [0, -1] (two bogus segments) where the oracle's generate_series
      // yields none — unreachable with the current tokenizer (empty text
      // tokenizes to [""]), but a latent divergence if that changes
      val segs = when(nSeg <= 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), nSeg - 1),
          i => array_join(slice(toks, i * lit(10) + 1, lit(10)), " ")))
      val segRows = docs(s, dir).select(col("doc_id"), dirty.as("txt"))
        .select(col("doc_id"), posexplode(segs).as(Seq("seg_idx", "seg")))
        .withColumn("fp", md5(col("seg")))
        .localCheckpoint(false) // feeds the dup-count branch AND the rebuild
      val dupFp = segRows.groupBy(col("fp"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("fp"))
      val kept = segRows.join(broadcast(dupFp), Seq("fp"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
             array_join(
               transform(array_sort(collect_list(struct(col("seg_idx"),
                                                        col("seg")))),
                         p => p.getField("seg")), " ").as("clean"))
      segRows.groupBy(col("doc_id")).agg(count(lit(1)).as("n_seg"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_seg"),
                (col("n_seg") - coalesce(col("n_kept"), lit(0L))).as("n_dup"),
                coalesce(col("n_kept"), lit(0L)).as("n_kept"),
                substring(coalesce(col("clean"), lit("")), 1, 60)
                  .as("clean_head"))
        .orderBy(col("doc_id"))
    }),

    // temperature-weighted source mixing (the standard multilingual /
    // multi-source rebalancing step: sample source s at rate
    // (n_s / max_n)^alpha, alpha = 0.5, so small sources are upweighted
    // relative to proportional sampling). The raw corpus is uniform
    // across sources, so a deterministic hash-mod thinning keyed by the
    // source index manufactures the skew the operator exists to correct.
    // Scale shape: per-source counts are one map-side-combined shuffle of
    // |sources| rows; the rate table broadcasts; membership is a pure
    // scan-side hash compare — the sample itself never shuffles.
    "q_mix_temperature" -> ((s, dir) => {
      val srcIdx = substring(col("source"), 4, 6).cast("int")
      val skewed = docs(s, dir)
        .filter(pmod(portableHash(col("doc_id"), 3), (srcIdx + 1).cast("long"))
                  === 0)
      val srcN = skewed.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      val rates = srcN
        .crossJoin(broadcast(srcN.agg(max(col("n_docs")).as("max_n"))))
        .select(col("source"), col("n_docs"),
                sqrt(col("n_docs").cast("double") / col("max_n")).as("rate"))
      val sampled = skewed.join(broadcast(rates), "source")
        .filter(pmod(portableHash(col("doc_id"), 99), lit(10000L)) <
                col("rate") * 10000)
        .groupBy(col("source")).agg(count(lit(1)).as("n_sampled"))
      rates.join(sampled, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
                coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
                round(col("rate"), 6).as("rate"))
        .orderBy(col("source"))
    }),

    // C4/Gopher-style quality-filter FUNNEL: apply rules in a fixed
    // cascade and report per-stage attrition (n_in -> n_out) — the
    // curation diagnostic that tells you which rule is eating the corpus.
    // Rules: (1) >= 30 tokens, (2) mean token length in [2,10],
    // (3) top-token ratio <= 20% (repetition), (4) contains a stopword.
    // Scale shape: rules 1/2/4 are scan-side; rule 3 is the one
    // (doc_id, tok) shuffle with map-side partials; the funnel itself is
    // a single global aggregate emitting 4 rows via stack().
    "q_filter_funnel" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val top = docs(s, dir)
        .select(col("doc_id"), explode(toks).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"),
                                    sum(col("c")).as("n_tok"))
      val flags = docs(s, dir).join(top, "doc_id")
        .select(
          (col("n_tok") >= 30).as("b1"),
          (length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
             col("n_tok")).between(2.0, 10.0).as("b2"),
          (col("top_c") * 5 <= col("n_tok")).as("b3"),
          (array_contains(toks, "the") || array_contains(toks, "a"))
            .as("b4"))
      flags.agg(
          count(lit(1)).as("n0"),
          count(when(col("b1"), 1)).as("n1"),
          count(when(col("b1") && col("b2"), 1)).as("n2"),
          count(when(col("b1") && col("b2") && col("b3"), 1)).as("n3"),
          count(when(col("b1") && col("b2") && col("b3") && col("b4"), 1))
            .as("n4"))
        .selectExpr(
          """stack(4,
             1, 'min_tokens',    n0, n1,
             2, 'avg_tok_len',   n1, n2,
             3, 'max_tok_ratio', n2, n3,
             4, 'stopword',      n3, n4) AS (stage, rule, n_in, n_out)""")
        .select(col("stage"), col("rule"), col("n_in"),
                (col("n_in") - col("n_out")).as("n_dropped"), col("n_out"))
        .orderBy(col("stage"))
    }),

    // radius similarity search: all corpus neighbors with cosine >= 0.25
    // of each probe. The scan-side complement to top-k: no per-query
    // window, no shuffle at all (see Similarity.rangeSearch).
    "q_sim_range" -> ((s, dir) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.rangeSearch(e, queries, minCos = 0.25)
        .select(col("q_id"), col("neighbor_id"),
                round(col("cos"), 6).as("cos"))
        .orderBy(col("q_id"), col("neighbor_id"))
    }),

    // embedding whitening (per-dimension standardization — the classic
    // retrieval-quality fix for anisotropic embedding spaces). Stats are
    // a posexplode + per-pos aggregate whose map-side partials collapse
    // the shuffle to |dims| rows; the (mu, sd) arrays broadcast as ONE
    // row; the transform is pure scan-side array math. Emitted as
    // fixed-point ints (x1000) so the string form is engine-portable.
    "q_embed_whiten" -> ((s, dir) => {
      val e = emb(s, dir)
      val v = col("embedding").cast("array<double>")
      val stats = e.select(posexplode(v).as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg(avg(col("x")).as("mu"), stddev_pop(col("x")).as("sd"))
      val packed = stats.agg(
          array_sort(collect_list(struct(col("pos"), col("mu")))).as("ms"),
          array_sort(collect_list(struct(col("pos"), col("sd")))).as("ss"))
        .select(transform(col("ms"), p => p.getField("mu")).as("mu"),
                transform(col("ss"), p => p.getField("sd")).as("sd"))
      val w1000 = transform(sequence(lit(0), size(v) - 1), i => {
        val x = element_at(v, i + 1)
        val m = element_at(col("mu"), i + 1)
        val d = element_at(col("sd"), i + 1)
        when(d === 0.0d, lit(0.0d))
          .otherwise(round((x - m) / d * 1000.0d, 0)).cast("int")
      })
      e.crossJoin(broadcast(packed))
        .select(col("vec_id"), size(v).as("n_dims"),
                concat(lit("["),
                       array_join(w1000.cast("array<string>"), ","),
                       lit("]")).as("w1000"))
        .orderBy(col("vec_id"))
    }),

    // token-budget corpus selection: rank docs by quality (here the
    // alpha-ratio heuristic), keep the best until the running token
    // total exceeds the budget — "give me the best 10k tokens". The
    // running sum is computed WITHOUT a single-partition global window:
    // value-range buckets over the (rounded) score give per-bucket
    // totals whose descending prefix (a constant-size driver fold over
    // <= 21 rows) offsets per-BUCKET windows — the distributed
    // prefix-sum shape that survives any corpus size, since every
    // window partition is one score bucket.
    "q_select_budget" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 10000L
      val d = docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        coalesce(round(TextAnalysis.alphaRatio(col("text")), 6), lit(0.0))
          .as("score"))
      val bucketed = d.withColumn("bkt",
        floor(col("score") * 20).cast("int")).localCheckpoint(false)
      // bucket totals -> descending-prefix offsets, driver-side (<= 21
      // rows — constant-size, like the bloom filter's ship-to-tasks)
      val totals = bucketed.groupBy(col("bkt"))
        .agg(sum(col("n_tokens")).as("t"))
        .collect().map(r => r.getAs[Int]("bkt") -> r.getAs[Long]("t"))
        .sortBy(-_._1)
      val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (b, t)) =>
        (b, acc + t)
      }.tail.zip(totals).map { case ((b, cumEnd), (_, t)) =>
        (b, cumEnd - t) // offset = tokens in strictly-higher buckets
      }
      val offDf = s.createDataFrame(offsets.toSeq).toDF("bkt", "offset")
      val wIn = Window.partitionBy(col("bkt"))
        .orderBy(col("score").desc, col("doc_id").asc)
      bucketed.join(broadcast(offDf), "bkt")
        .withColumn("cum", col("offset") + sum(col("n_tokens")).over(wIn))
        .filter(col("cum") <= budget)
        .select(col("doc_id"), col("n_tokens"), col("score"), col("cum"))
        .orderBy(col("doc_id"))
    }),

    // semantic dedup END-TO-END: cosine-threshold edges over the
    // embedding corpus -> connected components -> min-id representative
    // per cluster (the rows a dedup pass would keep). Edge generation
    // here is the exact all-pairs kernel so the whole chain stays
    // oracle-expressible; at corpus scale the edge stage swaps for the
    // LSH-bucketed candidate pairs (q_dedup_embedding_lsh's path) — the
    // clustering and representative stages are identical either way.
    "q_dedup_semantic" -> ((s, dir) => {
      val e = graft.dedup.Dedup.requireAllPairsBound(
          SharedCorpus.emb(s, dir), "q_dedup_semantic",
          "q_dedup_embedding_lsh edges + the same connectedComponents")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      // norms hoisted per row: one dot kernel per enumerated pair
      // instead of three (bit-identical — VectorFunctions.cosineHoisted)
      val a = e.select(col("vec_id").as("src"), col("v").as("va"),
                       VectorFunctions.norm2(col("v")).as("na"))
      val b = e.select(col("vec_id").as("dst"), col("v").as("vb"),
                       VectorFunctions.norm2(col("v")).as("nb"))
      val edges = a.join(b, col("src") < col("dst"))
        .filter(VectorFunctions.cosineHoisted(col("va"), col("vb"),
                                              col("na"), col("nb")) >= 0.3)
        .select(col("src"), col("dst"))
      val comps = Dedup.connectedComponents(edges, "src", "dst",
                                            shufflePartitions = 8)
      e.select(col("vec_id"))
        .join(comps, col("vec_id") === col("id"), "left")
        .select(col("vec_id"),
                coalesce(col("component"), col("vec_id")).as("cluster"))
        // min-label components carry the min member id as the label, so
        // the representative test is label == own id
        .withColumn("is_rep", col("cluster") === col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    // bigram-LM scoring (add-one smoothing): per-doc mean negative
    // log-likelihood under the corpus's own bigram distribution —
    // the context-aware upgrade of q_text_perplexity's unigram score.
    // Scale shape: one (doc, bigram) shuffle with map-side partials
    // (pinned — it feeds the corpus counts AND the scoring join); corpus
    // bigram and context tables are vocabulary-bounded; V is a scalar.
    "q_text_bigram_lm" -> ((s, dir) => {
      // both branches read the session's pinned tokenization
      // (SharedCorpus.docsTok) — the raw text is never re-tokenized
      val toks = SharedCorpus.docsTok(s, dir)
      val tf = toks
        .select(col("doc_id"),
                explode(TextAnalysis.bigrams(col("toks"))).as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
        .localCheckpoint(false)
      val cbg = tf.groupBy(col("bg")).agg(sum(col("tf")).as("cnt"))
      val ctx = cbg.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
        .agg(sum(col("cnt")).as("ctx_n"))
      val vocab = toks
        .select(explode(col("toks")).as("tok"))
        .agg(countDistinct(col("tok")).as("v"))
      tf.join(cbg, "bg")
        .withColumn("w1", substring_index(col("bg"), " ", 1))
        .join(ctx, "w1")
        .crossJoin(broadcast(vocab))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_bg"),
             round(-sum(col("tf").cast("double") *
                        log((col("cnt") + 1).cast("double") /
                            (col("ctx_n") + col("v")))) / sum(col("tf")),
                   4).as("nll"))
        .orderBy(col("doc_id"))
    }),

    // deterministic, layout-stable train/val/test split (90/5/5): the
    // assignment is a pure function of doc_id (md5 threshold), so adding
    // or re-partitioning data NEVER reassigns an existing doc — the
    // property sample-then-persist pipelines lose. The threshold compare
    // runs DIRECTLY on the fixed-width lowercase hex prefix (lexicographic
    // order == numeric order), so the whole assignment is scan-side
    // codegen'd string ops with zero shuffles before the rollup; the
    // per-(lang, split) rollup is a map-side partial agg. 0.9*2^32 =
    // 0xE6666666, 0.95*2^32 = 0xF3333333.
    "q_split_assign" -> ((s, dir) => {
      val h = substring(
        md5(concat(col("doc_id").cast("string"), lit(":split"))), 1, 8)
      docs(s, dir)
        .withColumn("split",
          when(h < "e6666666", "train")
            .when(h < "f3333333", "val").otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .orderBy(col("lang"), col("split"))
    }),

    // LEAKAGE-SAFE SPLIT: train/val/test assignment that is ATOMIC per
    // exact-duplicate group — every doc sharing a normalized-content
    // fingerprint lands in the SAME split. A plain per-doc hash split
    // (q_split_assign) lets near-identical docs straddle train/test,
    // leaking evaluation data into training; here the md5-threshold
    // scheme hashes the GROUP FINGERPRINT itself, so group-atomicity
    // holds by construction, the assignment is layout-stable, AND it
    // stays stable under corpus churn (a group's fp never changes —
    // the maintained face cdc_split_view shares the exact scheme with
    // zero extra state). Scale shape: the split is pure scan-side
    // (fingerprint + hash + threshold, no window, no join); the only
    // shuffle is the rollup's distinct-group count.
    "q_split_leakage_safe" -> ((s, dir) => {
      val h = substring(md5(concat(col("__fp"), lit(":split"))), 1, 8)
      docs(s, dir)
        .withColumn("__fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("split",
          when(h < "e6666666", "train")
            .when(h < "f3333333", "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("__fp")).as("n_groups"),
             sum(col("n_chars")).as("n_chars"))
        .orderBy(col("split"))
    }),

    // PII entity detection + redaction over planted identifiers (the
    // corpus is synthetic word salad, so emails/phones/IPs/SSNs are
    // planted deterministically per doc — every doc gets an email, a
    // phone, and an IP; every 5th an SSN). Counts come from independent
    // regexp_extract_all passes on the dirty text; the redacted length
    // checks the full replace chain. Scale shape: pure scan-side
    // codegen'd regex work (no UDF, no shuffle before the per-lang
    // rollup) — exactly how a 100 TB scrub pass should plan.
    "q_pii_stats" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val dirty = concat(
        col("text"), lit(" reach user"), id, lit("@example.org or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), ((col("doc_id") * 7) % 256).cast("string"),
        when(col("doc_id") % 5 === 0,
             concat(lit(" ssn 123-45-"),
                    lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"
      val ipRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
      val ssnRe = "\\d{3}-\\d{2}-\\d{4}"
      val redacted = regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(dirty, ssnRe, "[SSN]"),
            phoneRe, "[PHONE]"),
          ipRe, "[IP]"),
        emailRe, "[EMAIL]")
      docs(s, dir)
        .select(col("lang"),
                size(regexp_extract_all(dirty, lit(emailRe), lit(0)))
                  .as("e"),
                size(regexp_extract_all(dirty, lit(phoneRe), lit(0)))
                  .as("p"),
                size(regexp_extract_all(dirty, lit(ipRe), lit(0))).as("i"),
                size(regexp_extract_all(dirty, lit(ssnRe), lit(0))).as("s"),
                length(redacted).as("red_len"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("e")).as("n_emails"), sum(col("p")).as("n_phones"),
             sum(col("i")).as("n_ips"), sum(col("s")).as("n_ssns"),
             sum(col("red_len")).as("redacted_chars"))
        .orderBy(col("lang"))
    }))

  // shared DuckDB fragments (mirrors of TextAnalysis.tokens / portableHash)
  private val toksSql =
    "string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
  // mirror of TextAnalysis.fingerprint (PipelineQueries.normText)
  private val fpSql =
    "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"
  private def pHashSql(key: String, seed: Int): String =
    s"('0x' || substr(md5($key::VARCHAR || ':$seed'), 1, 8))::BIGINT"

  val oracle: Map[String, String] = Map(
    "q_split_leakage_safe" ->
      s"""WITH a AS (
        |  SELECT n_chars, $fpSql AS fp,
        |    CASE WHEN substr(md5($fpSql || ':split'), 1, 8)
        |              < 'e6666666' THEN 'train'
        |         WHEN substr(md5($fpSql || ':split'), 1, 8)
        |              < 'f3333333' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  count(DISTINCT fp) AS n_groups,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM a GROUP BY 1 ORDER BY split""".stripMargin,
    "q_split_assign" ->
      """WITH a AS (
        |  SELECT lang, n_chars,
        |    substr(md5(doc_id::VARCHAR || ':split'), 1, 8) AS h
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN h < 'e6666666' THEN 'train'
        |       WHEN h < 'f3333333' THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM a GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
    "q_pii_stats" -> {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"
      val ipRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
      val ssnRe = "\\d{3}-\\d{2}-\\d{4}"
      s"""WITH d AS (
        |  SELECT lang,
        |    text || ' reach user' || doc_id::VARCHAR ||
        |    '@example.org or +1-555-' ||
        |    lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
        |    ' from 10.' || (doc_id % 256)::VARCHAR ||
        |    '.0.' || ((doc_id * 7) % 256)::VARCHAR ||
        |    CASE WHEN doc_id % 5 = 0
        |         THEN ' ssn 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
        |         ELSE '' END AS dirty
        |  FROM documents),
        |c AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(dirty, '$emailRe')) AS INT) AS e,
        |    CAST(len(regexp_extract_all(dirty, '$phoneRe')) AS INT) AS p,
        |    CAST(len(regexp_extract_all(dirty, '$ipRe')) AS INT) AS i,
        |    CAST(len(regexp_extract_all(dirty, '$ssnRe')) AS INT) AS s,
        |    length(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(dirty, '$ssnRe', '[SSN]', 'g'),
        |      '$phoneRe', '[PHONE]', 'g'), '$ipRe', '[IP]', 'g'),
        |      '$emailRe', '[EMAIL]', 'g')) AS red_len
        |  FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(e) AS BIGINT) AS n_emails,
        |  CAST(sum(p) AS BIGINT) AS n_phones,
        |  CAST(sum(i) AS BIGINT) AS n_ips,
        |  CAST(sum(s) AS BIGINT) AS n_ssns,
        |  CAST(sum(red_len) AS BIGINT) AS redacted_chars
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q_dedup_segments" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |         THEN '$Boilerplate' || ' ' || text ELSE text END AS text
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, $toksSql AS toks,
        |    CAST(ceil(len($toksSql) / 10.0) AS INT) AS n_seg
        |  FROM d),
        |seg AS (
        |  SELECT doc_id, seg_idx,
        |    array_to_string(toks[seg_idx*10+1 : seg_idx*10+10], ' ') AS seg
        |  FROM (SELECT doc_id, toks,
        |          CAST(unnest(generate_series(0, n_seg - 1)) AS INT)
        |            AS seg_idx
        |        FROM t)),
        |dup AS (
        |  SELECT seg FROM seg GROUP BY seg
        |  HAVING count(DISTINCT doc_id) >= 2),
        |kept AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    array_to_string(list(seg ORDER BY seg_idx), ' ') AS clean
        |  FROM seg WHERE seg NOT IN (SELECT seg FROM dup)
        |  GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_seg FROM seg GROUP BY doc_id)
        |SELECT tot.doc_id, tot.n_seg,
        |  tot.n_seg - coalesce(kept.n_kept, 0) AS n_dup,
        |  coalesce(kept.n_kept, 0) AS n_kept,
        |  substr(coalesce(kept.clean, ''), 1, 60) AS clean_head
        |FROM tot LEFT JOIN kept USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_mix_temperature" ->
      s"""WITH skewed AS (
        |  SELECT doc_id, source FROM documents
        |  WHERE ${pHashSql("doc_id", 3)} % (substr(source, 4)::INT + 1) = 0),
        |srcn AS (SELECT source, count(*) AS n_docs FROM skewed
        |         GROUP BY source),
        |rates AS (
        |  SELECT source, n_docs,
        |    sqrt(CAST(n_docs AS DOUBLE) / (SELECT max(n_docs) FROM srcn))
        |      AS rate
        |  FROM srcn),
        |samp AS (
        |  SELECT s.source, count(*) AS n_sampled
        |  FROM skewed s JOIN rates r USING (source)
        |  WHERE ${pHashSql("doc_id", 99)} % 10000 < r.rate * 10000
        |  GROUP BY s.source)
        |SELECT source, n_docs, coalesce(n_sampled, 0) AS n_sampled,
        |  round(rate, 6) AS rate
        |FROM rates LEFT JOIN samp USING (source)
        |ORDER BY source""".stripMargin,
    "q_filter_funnel" ->
      s"""WITH tokc AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
        |  GROUP BY doc_id, tok),
        |top AS (
        |  SELECT doc_id, max(c) AS top_c, sum(c) AS n_tok
        |  FROM tokc GROUP BY doc_id),
        |flags AS (
        |  SELECT
        |    (n_tok >= 30) AS b1,
        |    (CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
        |       / n_tok BETWEEN 2.0 AND 10.0) AS b2,
        |    (top_c * 5 <= n_tok) AS b3,
        |    (list_contains($toksSql, 'the')
        |       OR list_contains($toksSql, 'a')) AS b4
        |  FROM documents JOIN top USING (doc_id)),
        |agg AS (
        |  SELECT count(*) AS n0,
        |    count(*) FILTER (WHERE b1) AS n1,
        |    count(*) FILTER (WHERE b1 AND b2) AS n2,
        |    count(*) FILTER (WHERE b1 AND b2 AND b3) AS n3,
        |    count(*) FILTER (WHERE b1 AND b2 AND b3 AND b4) AS n4
        |  FROM flags)
        |SELECT stage, rule, n_in, n_in - n_out AS n_dropped, n_out
        |FROM (
        |  SELECT 1 AS stage, 'min_tokens' AS rule, n0 AS n_in, n1 AS n_out
        |  FROM agg
        |  UNION ALL SELECT 2, 'avg_tok_len', n1, n2 FROM agg
        |  UNION ALL SELECT 3, 'max_tok_ratio', n2, n3 FROM agg
        |  UNION ALL SELECT 4, 'stopword', n3, n4 FROM agg)
        |ORDER BY stage""".stripMargin,
    "q_sim_range" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 3),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT q_id, vec_id AS neighbor_id,
        |  round(list_cosine_similarity(qv, v), 6) AS cos
        |FROM q, c
        |WHERE vec_id <> q_id AND list_cosine_similarity(qv, v) >= 0.25
        |ORDER BY q_id, neighbor_id""".stripMargin,
    "q_embed_whiten" ->
      """WITH x AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |stats AS (
        |  SELECT pos, avg(e) AS mu, stddev_pop(e) AS sd
        |  FROM (SELECT unnest(v) AS e,
        |          CAST(unnest(generate_series(1, len(v))) AS INT) AS pos
        |        FROM x)
        |  GROUP BY pos),
        |packed AS (
        |  SELECT list(mu ORDER BY pos) AS mu, list(sd ORDER BY pos) AS sd
        |  FROM stats)
        |SELECT vec_id, CAST(len(v) AS INT) AS n_dims,
        |  '[' || array_to_string(
        |    list_transform(generate_series(1, len(v)),
        |      i -> CAST(CAST(round(CASE WHEN sd[i] = 0 THEN 0
        |                    ELSE (v[i] - mu[i]) / sd[i] * 1000 END, 0)
        |                AS INT) AS VARCHAR)), ',') || ']' AS w1000
        |FROM x CROSS JOIN packed
        |ORDER BY vec_id""".stripMargin,
    "q_select_budget" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
        |    coalesce(round(
        |      CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |           AS DOUBLE) / nullif(length(text), 0), 6), 0) AS score
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens, score,
        |    CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id)
        |         AS BIGINT) AS cum
        |  FROM d)
        |SELECT doc_id, n_tokens, score, cum FROM c
        |WHERE cum <= 10000 ORDER BY doc_id""".stripMargin,
    "q_dedup_semantic" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.3),
        |sym AS (
        |  SELECT src, dst FROM edges
        |  UNION SELECT dst AS src, src AS dst FROM edges),
        |reach(id, r) AS (
        |  SELECT vec_id, vec_id FROM e
        |  UNION
        |  SELECT s.dst, reach.r FROM sym s JOIN reach ON s.src = reach.id)
        |SELECT id AS vec_id, min(r) AS cluster, (min(r) = id) AS is_rep
        |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin,
    "q_text_bigram_lm" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM toks)),
        |tf AS (SELECT doc_id, bg, count(*) AS tf FROM bg
        |       GROUP BY doc_id, bg),
        |cbg AS (SELECT bg, sum(tf) AS cnt FROM tf GROUP BY bg),
        |ctx AS (SELECT split_part(bg, ' ', 1) AS w1, sum(cnt) AS ctx_n
        |        FROM cbg GROUP BY 1),
        |vocab AS (
        |  SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(t) AS tok FROM toks))
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bg,
        |  round(-sum(CAST(tf AS DOUBLE) *
        |             ln(CAST(cnt + 1 AS DOUBLE) / (ctx_n + v))) / sum(tf),
        |        4) AS nll
        |FROM tf
        |JOIN cbg USING (bg)
        |JOIN ctx ON split_part(bg, ' ', 1) = ctx.w1
        |CROSS JOIN vocab
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
