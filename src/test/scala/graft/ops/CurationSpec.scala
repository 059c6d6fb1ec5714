package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant tests for the curation-wave operators (CurationQueries):
  * planted-signal recovery, funnel monotonicity, whitening statistics,
  * range-search consistency, and the CDC schema-drift report. The exact
  * values are covered by the DuckDB oracle gate; these assert the
  * semantic properties that make each operator correct BY CONSTRUCTION
  * (so a future refactor that keeps the oracle green but breaks the
  * semantics still fails). */
class CurationSpec extends SparkSpec {

  private def run(name: String) =
    CurationQueries.queries(name)(spark, sfDir)

  test("q_dedup_segments strips the planted boilerplate from every third doc") {
    val out = run("q_dedup_segments").cache()
    val planted = out.filter(col("doc_id") % 3 === 0)
    // every planted doc loses at least its boilerplate segment
    assert(planted.filter(col("n_dup") === 0).count() == 0)
    // and the cleaned text no longer begins with it
    assert(planted.filter(col("clean_head").startsWith("subscribe now"))
      .count() == 0)
    // totals reconcile
    assert(out.filter(col("n_seg") =!= col("n_dup") + col("n_kept"))
      .count() == 0)
    out.unpersist()
  }

  test("q_mix_temperature: rate grows with source size, max source keeps all") {
    val rows = run("q_mix_temperature").collect()
    assert(rows.nonEmpty)
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
    // rate = sqrt(n/max) is monotone in n and hits 1.0 at the max source
    assert(byN.zip(byN.tail).forall { case (a, b) =>
      a.getAs[Double]("rate") <= b.getAs[Double]("rate") + 1e-9 })
    assert(math.abs(byN.last.getAs[Double]("rate") - 1.0) < 1e-9)
    assert(rows.forall(r =>
      r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs")))
  }

  test("q_filter_funnel: stages chain (n_in(i+1) == n_out(i)) and shrink") {
    val rows = run("q_filter_funnel").collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.length == 4)
    assert(rows.forall(r =>
      r.getAs[Long]("n_out") <= r.getAs[Long]("n_in")))
    assert(rows.zip(rows.tail).forall { case (a, b) =>
      b.getAs[Long]("n_in") == a.getAs[Long]("n_out") })
    val total = graft.Tables.load(spark, sfDir, "documents").count()
    assert(rows.head.getAs[Long]("n_in") == total)
  }

  test("q_sim_range: thresholded, self-free, and a superset of top-k hits") {
    val out = run("q_sim_range").cache()
    assert(out.filter(col("cos") < 0.25).count() == 0)
    assert(out.filter(col("q_id") === col("neighbor_id")).count() == 0)
    // any brute-force top-3 neighbor above the radius must be in the set
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val qs = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val topHits = graft.similarity.Similarity
      .bruteForceTopK(e, qs, k = 3)
      .filter(col("cos") >= 0.25)
      .select(col("q_id"), col("neighbor_id"))
    assert(topHits.join(out, Seq("q_id", "neighbor_id"), "left_anti")
      .count() == 0)
    out.unpersist()
  }

  test("q_embed_whiten: per-dimension mean ~0 and std ~1000 (fixed-point)") {
    val out = run("q_embed_whiten")
      .select(posexplode(split(regexp_replace(col("w1000"), "[\\[\\]]", ""),
                               ",").cast("array<int>")).as(Seq("pos", "w")))
    val stats = out.groupBy(col("pos"))
      .agg(avg(col("w")).as("mu"), stddev_pop(col("w")).as("sd"))
      .agg(max(abs(col("mu"))).as("worst_mu"),
           max(abs(col("sd") - 1000)).as("worst_sd"))
      .collect()(0)
    // rounding to ints moves each value < 0.5, so the per-dim mean stays
    // within +-1 of 0 and the std within ~1% of 1000
    assert(stats.getAs[Double]("worst_mu") < 1.0)
    assert(stats.getAs[Double]("worst_sd") < 15.0)
  }

  test("q_text_bigram_lm: every doc scores, n_bg == n_tokens - 1") {
    val out = run("q_text_bigram_lm")
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
              graft.text.TextAnalysis.tokenCount(col("text")).as("n_tok"))
    assert(out.count() == docs.count())
    assert(out.filter(col("nll") <= 0).count() == 0)
    assert(out.join(docs, "doc_id")
      .filter(col("n_bg") =!= col("n_tok") - 1).count() == 0)
  }

  test("q_sim_range plan is shuffle-free (broadcast probes, scan-side filter)") {
    // the radius search's value over top-k IS the absent exchange: the
    // probe set broadcasts and the threshold filters scan-side, so the
    // corpus is read once with no repartitioning at any scale
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val qs = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val plan = graft.similarity.Similarity.rangeSearch(e, qs, minCos = 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"radius search must not shuffle the corpus:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"probe set should broadcast:\n$plan")
  }

  test("q_select_budget: prefix of the quality order, within budget") {
    val out = run("q_select_budget").cache()
    assert(out.count() > 0)
    // the running total never exceeds the budget
    assert(out.agg(max(col("cum"))).collect()(0).getLong(0) <= 10000L)
    // selection is a PREFIX of the (score desc, doc_id) order: no
    // unselected doc outscores a selected one
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
              coalesce(round(graft.text.TextAnalysis
                .alphaRatio(col("text")), 6), lit(0.0)).as("score"))
    val unselected = docs.join(out.select("doc_id"), Seq("doc_id"),
                               "left_anti")
    val minSel = out.agg(min(col("score"))).collect()(0).getDouble(0)
    assert(unselected.filter(col("score") > minSel).count() == 0)
    out.unpersist()
  }

  test("q_select_budget plan: no single-partition exchange (bucketed windows)") {
    // the whole point of the bucket+offset construction is that the
    // cumulative sum never funnels the corpus through one partition
    val plan = run("q_select_budget").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"budget selection must not single-partition the corpus:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"bucket offsets should broadcast:\n$plan")
  }

  test("q_dedup_semantic: reps are cluster minima, edges never cross clusters") {
    val out = run("q_dedup_semantic").cache()
    // the min-label invariant: every cluster's label is its min member
    val agg = out.groupBy(col("cluster"))
      .agg(min(col("vec_id")).as("mn"))
    assert(agg.filter(col("cluster") =!= col("mn")).count() == 0)
    // reps are exactly one per cluster
    assert(out.filter(col("is_rep")).count() ==
           out.select(col("cluster")).distinct().count())
    // recompute the threshold edges independently; endpoints must share
    // a cluster (closure under similarity edges)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val edges = e.select(col("vec_id").as("src"), col("v").as("va"))
      .join(e.select(col("vec_id").as("dst"), col("v").as("vb")),
            col("src") < col("dst"))
      .filter(graft.functions.VectorFunctions.cosine(col("va"), col("vb"))
                >= 0.3)
      .select(col("src"), col("dst"))
    val cSrc = out.select(col("vec_id").as("src"), col("cluster").as("cs"))
    val cDst = out.select(col("vec_id").as("dst"), col("cluster").as("cd"))
    assert(edges.join(cSrc, "src").join(cDst, "dst")
      .filter(col("cs") =!= col("cd")).count() == 0)
    out.unpersist()
  }

  test("cdc_schema_drift flags exactly the planted unknown key") {
    val out = CdcQueries.queries("cdc_schema_drift")(spark, sfDir).cache()
    val unknown = out.filter(!col("known")).collect()
    assert(unknown.length == 1 && unknown(0).getAs[String]("key") == "o_shard")
    // every known key appears on every event; the drifted key on ~1/7
    val knownCounts =
      out.filter(col("known")).select(col("n_events")).distinct().collect()
    assert(knownCounts.length == 1)
    val nAll = knownCounts(0).getLong(0)
    val nDrift = unknown(0).getAs[Long]("n_events")
    assert(nDrift > 0 && nDrift < nAll)
    out.unpersist()
  }

  test("q_split_leakage_safe: no duplicate group ever spans two splits") {
    import graft.text.TextAnalysis
    // the leakage invariant on a corpus with PLANTED duplicates: clone
    // every 7th doc's text onto its neighbor so groups genuinely span
    // multiple doc_ids, then assert every fingerprint maps to exactly
    // one split under the group-atomic assignment
    val base = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val donor = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1).as("doc_id"), col("text").as("__dup"))
    val docs = base.join(donor, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__dup"), col("text")).as("text"))
    val h = substring(md5(concat(col("fp"), lit(":split"))), 1, 8)
    val assigned = docs
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("split",
        when(h < "e6666666", "train")
          .when(h < "f3333333", "val").otherwise("test"))
    // planted groups exist (some fp covers >1 doc)...
    val multi = assigned.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("n"),
           countDistinct(col("split")).as("ns"))
    assert(multi.filter(col("n") > 1).count() > 0, "no planted dup groups")
    // ...and NONE spans two splits — the leakage invariant
    assert(multi.filter(col("ns") > 1).count() == 0,
      "a duplicate group straddles train/test — leakage")
    // the named query runs and covers all three splits at this sf
    val out = run("q_split_leakage_safe").collect()
    assert(out.map(_.getString(0)).toSet == Set("train", "val", "test"))
    assert(out.map(_.getLong(1)).sum ==
             graft.Tables.load(spark, sfDir, "documents").count())
  }
}
