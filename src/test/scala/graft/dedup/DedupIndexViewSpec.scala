package graft.dedup

import graft.SparkSpec
import graft.cdc.{ChangelogGen, IncrementalAgg, Materializer, TableViews}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incrementally maintained MinHash-LSH index and exact-dup groups
  * must equal their from-scratch batch computations over the live corpus
  * after EVERY batch — while only ever computing signatures for changed
  * docs. */
class DedupIndexViewSpec extends SparkSpec {

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  /** Decoded change events from hand-written Maxwell lines. */
  private def events(lines: Seq[String]): DataFrame =
    graft.cdc.RowDecoder.changeEvents(
      graft.cdc.Maxwell.parseEnvelope(
        spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)),
      ChangelogGen.documentsSpec)

  private def doc(op: String, ts: Long, id: Long, text: String,
                  old: Option[String] = None): String = {
    val oldPart = old.map(o =>
      s""","old":{"text":${ujson(o)},"n_chars":${o.length}}""").getOrElse("")
    s"""{"database":"${ChangelogGen.Database}","table":"documents",""" +
      s""""type":"$op","ts":$ts,"data":{"doc_id":$id,"text":${ujson(text)},""" +
      s""""lang":"en","source":"t","n_chars":${text.length}}$oldPart}"""
  }
  private def ujson(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private val B = 4
  private val R = 2
  private val N = 3

  /** From-scratch batch candidate pairs over a live corpus. */
  private def batchPairs(live: DataFrame): Set[String] =
    rowsOf(Dedup.lshCandidatePairs(live, "doc_id", "text",
                                   b = B, r = R, nGram = N))

  /** Replay `ev` with `cuts`, return (live state, maintained pairs,
    * maintained index). */
  private def replayed(ev: DataFrame, cuts: Seq[Long],
                       maxLocalKeys: Int = 100000)
      : (DataFrame, DataFrame, DataFrame) = {
    val m = DedupIndexView.maintainer("doc_id", "text", b = B, r = R,
                                      nGram = N)
    val res = TableViews.replay(ev, cuts, Seq("doc_id"), Seq(m),
                                maxLocalKeys = maxLocalKeys)
    (Materializer.liveView(res.state), res(m).pairs, res(m).index)
  }

  private val wolf = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark forest tonight"
  private val wolf2 = "a quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark forest tonight"
  private val metal = "heavy metal pipes clang loudly in the empty " +
    "warehouse while workers assemble the giant turbine frame"
  private val metal2 = "heavy metal pipes clang loudly in the empty " +
    "warehouse while workers assemble the giant turbine core"

  test("maintained index/pairs equal the from-scratch batch build after every batch") {
    val log = Seq(
      // batch 1 (ts <= 10): two near-dups + one distinct
      doc("insert", 1, 1, wolf), doc("insert", 2, 2, wolf2),
      doc("insert", 3, 3, metal),
      // batch 2 (ts <= 20): doc 2 rewritten AWAY from 1 and INTO metal's
      // neighborhood; doc 4 arrives as a near-dup of 1
      doc("update", 11, 2, metal2, old = Some(wolf2)),
      doc("insert", 12, 4, wolf2),
      // batch 3: delete doc 3 — its pairs must retract with it
      doc("delete", 21, 3, metal2)
    )
    val ev = events(log)
    // batching invariance: one batch, two batches, or three must all
    // land on the same index/pairs as the from-scratch batch build
    // (per-prefix stepwise equality is the next test)
    for (cuts <- Seq(Seq.empty[Long], Seq(10L), Seq(10L, 20L))) {
      val (live, pairs, index) = replayed(ev, cuts)
      assert(rowsOf(pairs) == batchPairs(live),
        s"maintained pairs != batch build with cuts=$cuts")
      val scratch = Dedup.minhashSignatures(live, "doc_id", "text",
          k = B * R, nGram = N)
        .select(col("id"), explode(Dedup.bands(col("sig"), B, R)).as("bb"))
        .select(col("id"), col("bb.band"), col("bb.bandHash"))
      assert(rowsOf(index) == rowsOf(scratch),
        s"maintained index != batch signatures with cuts=$cuts")
    }
  }

  test("per-batch semantics: retract on rewrite, emit on arrival, retract on delete") {
    val b1 = events(Seq(
      doc("insert", 1, 1, wolf), doc("insert", 2, 2, wolf2),
      doc("insert", 3, 3, metal)))
    val (_, p1, _) = replayed(b1, Seq.empty)
    assert(rowsOf(p1) == Set("[1,2]"), s"batch1 pairs: ${rowsOf(p1)}")

    val b2 = events(Seq(
      doc("insert", 1, 1, wolf), doc("insert", 2, 2, wolf2),
      doc("insert", 3, 3, metal),
      doc("update", 11, 2, metal2, old = Some(wolf2)),
      doc("insert", 12, 4, wolf2)))
    val (_, p2, _) = replayed(b2, Seq(10L))
    assert(rowsOf(p2) == Set("[1,4]", "[2,3]"),
      s"rewrite must move doc 2 across neighborhoods: ${rowsOf(p2)}")

    val b3 = events(Seq(
      doc("insert", 1, 1, wolf), doc("insert", 2, 2, wolf2),
      doc("insert", 3, 3, metal),
      doc("update", 11, 2, metal2, old = Some(wolf2)),
      doc("insert", 12, 4, wolf2),
      doc("delete", 21, 3, metal2)))
    val (_, p3, i3) = replayed(b3, Seq(10L, 20L))
    assert(rowsOf(p3) == Set("[1,4]"),
      s"deleting doc 3 must retract its pairs: ${rowsOf(p3)}")
    assert(i3.filter(col("id") === 3).count() == 0,
      "deleted doc's bands must leave the index")
  }

  test("maintained pair scores equal a from-scratch verify after every batch") {
    // patch-time verification invariant: `scores` holds EXACTLY the
    // distinct candidate pairs, each with the Jaccard a from-scratch
    // verify over the live texts would compute — including pairs whose
    // docs never changed after their bucket cooled/heated
    val log = Seq(
      doc("insert", 1, 1, wolf), doc("insert", 2, 2, wolf2),
      doc("insert", 3, 3, metal),
      doc("update", 11, 2, metal2, old = Some(wolf2)),
      doc("insert", 12, 4, wolf2),
      doc("delete", 21, 3, metal2))
    val m = DedupIndexView.maintainer("doc_id", "text", b = B, r = R,
                                      nGram = N)
    val res = TableViews.replay(events(log), Seq(10L, 20L), Seq("doc_id"),
                                Seq(m))
    val live = Materializer.liveView(res.state)
    val a = live.select(col("doc_id").as("id_a"), col("text").as("ta"))
    val b = live.select(col("doc_id").as("id_b"), col("text").as("tb"))
    val scratch = res(m).pairs.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
              Dedup.ngramJaccard(col("ta"), col("tb"), N).as("score"))
    assert(rowsOf(res(m).scores) == rowsOf(scratch),
      "maintained scores != from-scratch verify over the live texts")
  }

  test("index serve is a state read: no join, no corpus scan in the plan") {
    // the round-14 weak item: the verified-index serve used to re-join
    // the corpus-sized live state twice and recompute per-pair Jaccard
    // per serve. With patch-time verification the serve must be a read
    // of the maintained scores frame — a single pinned-frame leaf,
    // no join of any kind, no parquet rescans (the cdc_lm_score
    // discipline).
    for (q <- Seq("cdc_dedup_index", "cdc_semantic_index")) {
      val face = graft.ops.CdcQueries.queries(q)(spark, sfDir)
      face.count() // force the shared replay builds, then replan fresh
      val again = graft.ops.CdcQueries.queries(q)(spark, sfDir)
      val plan = again.queryExecution.executedPlan
      assert(!plan.toString.contains("Join"),
        s"$q serve plan joins:\n$plan")
      val leaves = plan.collectLeaves().map(_.toString)
      assert(leaves.size == 1,
        s"$q serve reads ${leaves.size} frames (expected the scores " +
          s"frame alone):\n${leaves.mkString("\n")}")
      assert(!leaves.head.contains("Scan parquet"),
        s"$q serve rescans parquet:\n${leaves.head}")
    }
  }

  test("over-cap (distributed fallback) replay equals the local-keys replay") {
    val ev = ChangelogGen.documentsChangeEvents(spark, sfDir)
    val cuts = Seq(ChangelogGen.DocT1, ChangelogGen.DocT2)
    val (liveA, pairsA, _) = replayed(ev, cuts)
    val (_, pairsB, _) = replayed(ev, cuts, maxLocalKeys = 1)
    assert(rowsOf(pairsA) == rowsOf(pairsB),
      "over-cap distributed path diverges from the local-keys path")
    assert(rowsOf(pairsA) == batchPairs(liveA),
      "testdata replay != from-scratch batch build")
  }

  test("embedding-LSH index: maintained pairs equal the from-scratch build") {
    val ev = ChangelogGen.embeddingsChangeEvents(spark, sfDir)
    val m = DedupIndexView.embeddingMaintainer("vec_id", "embedding",
                                               dim = 64)
    val res = TableViews.replay(ev,
      Seq(ChangelogGen.DocT1, ChangelogGen.DocT2), Seq("vec_id"), Seq(m))
    val live = Materializer.liveView(res.state)
      .select(col("vec_id"), col("embedding"))
    assert(rowsOf(res(m).pairs) ==
             rowsOf(Dedup.embeddingLshCandidates(live, "vec_id",
                                                 "embedding", dim = 64)),
      "maintained embedding-LSH pairs != from-scratch build")
    // updated vectors moved buckets: no stale bands for deleted ids
    assert(res(m).index.join(live, res(m).index("id") === live("vec_id"),
                             "left_anti").count() == 0,
      "index carries bands for non-live vectors")
  }

  test("under local keys a step never reshuffles the persisted state") {
    // state after two batches, then hand-step a tiny third batch and
    // inspect its physical plans: the INDEX patch must be broadcast-only
    // (no shuffle join at all), and in the PAIR step the persisted
    // provenance rows must only pass through broadcast anti joins —
    // never under an Exchange. (The touched-bucket pair REGENERATION is
    // a |touched|-bounded shuffle self-join by design — its inputs are
    // semi-filtered to the changed buckets before any exchange, so an
    // SMJ there is fine; an Exchange over the carried state is the
    // scale bug this spec guards against.)
    val m = DedupIndexView.maintainer("doc_id", "text", b = B, r = R,
                                      nGram = N)
    val base = Seq(
      doc("insert", 1, 1, wolf), doc("insert", 2, 2, wolf2),
      doc("insert", 3, 3, metal))
    val res = TableViews.replay(events(base), Seq(10L), Seq("doc_id"),
                                Seq(m))
    val delta = events(Seq(doc("insert", 21, 4, metal2)))
    val (ctx, _) = TableViews.batchCtx(res.state, delta, Seq("doc_id"),
                                       maxLocalKeys = 100000)
    assert(ctx.ckLocal, "tiny delta must take the local-keys path")
    val next = m.step(res(m), ctx)
    val idxPlan = next.index.queryExecution.executedPlan.toString
    assert(!idxPlan.contains("SortMergeJoin") &&
             !idxPlan.contains("ShuffledHashJoin"),
      s"index patch plan shuffle-joins the index:\n$idxPlan")
    // persisted pair rows (schema ...id_a,id_b without an id column)
    // must not sit under any shuffle exchange
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val pairPlan = next.byBucket.queryExecution.executedPlan
    val shuffledScans = pairPlan.collect {
      case e: ShuffleExchangeExec => e.collectLeaves().map(_.toString)
    }.flatten.filter(s => s.contains("id_a") && s.contains("Scan"))
    assert(shuffledScans.isEmpty,
      s"persisted pair state is reshuffled:\n${shuffledScans.mkString}\n" +
        pairPlan)
  }

  test("hot-bucket cap is exactly maintained across crossings (hysteresis)") {
    // three identical docs share every bucket; cap = 2 keeps the bucket
    // degenerate (no pairs). Deleting one COOLS the bucket below the
    // cap — the unchanged survivors' pair must now EMERGE (the case a
    // bare pair view without bucket provenance can never produce, since
    // no changed id touches the surviving pair). Re-inserting HEATS it
    // back over the cap — the pair must retract again.
    val same = "identical degenerate content planted many times over"
    def run(lines: Seq[String]): (DataFrame, DataFrame) = {
      val m = DedupIndexView.maintainer("doc_id", "text", b = B, r = R,
                                        nGram = N, maxBucket = 2)
      val res = TableViews.replay(events(lines), Seq(10L, 20L),
                                  Seq("doc_id"), Seq(m))
      (Materializer.liveView(res.state), res(m).pairs)
    }
    def scratch(live: DataFrame): Set[String] =
      rowsOf(Dedup.lshCandidatePairs(live, "doc_id", "text",
        b = B, r = R, nGram = N, maxBucket = 2))
    val base = Seq(
      doc("insert", 1, 1, same), doc("insert", 2, 2, same),
      doc("insert", 3, 3, same))
    val (l1, p1) = run(base)
    assert(rowsOf(p1) == scratch(l1) && rowsOf(p1).isEmpty,
      s"over-cap bucket must emit no pairs: ${rowsOf(p1)}")
    // cool: delete doc 3 in a later batch -> (1,2) must EMERGE
    val (l2, p2) = run(base :+ doc("delete", 11, 3, same))
    assert(rowsOf(p2) == scratch(l2) && rowsOf(p2) == Set("[1,2]"),
      s"cooled bucket must emit its surviving pair: ${rowsOf(p2)}")
    // heat: doc 4 arrives -> population 3 again, all pairs retract
    val (l3, p3) = run(base ++ Seq(doc("delete", 11, 3, same),
                                   doc("insert", 21, 4, same)))
    assert(rowsOf(p3) == scratch(l3) && rowsOf(p3).isEmpty,
      s"re-heated bucket must retract its pairs: ${rowsOf(p3)}")
  }

  test("text clusters over the index == from-scratch Jaccard-edge CC per prefix") {
    // the TEXT modality of ClusterView.overIndex (cdc_text_clusters):
    // components over the maintained index's patch-time-verified scores
    // must equal CC over the exact >= 0.5 Jaccard edges of the live
    // corpus after every batching — including the rewrite that moves
    // doc 2 across neighborhoods and the delete that shrinks one
    val log = Seq(
      doc("insert", 1, 1, wolf), doc("insert", 2, 2, wolf2),
      doc("insert", 3, 3, metal),
      doc("update", 11, 2, metal2, old = Some(wolf2)),
      doc("insert", 12, 4, wolf2),
      doc("delete", 21, 3, metal2))
    val ev = events(log)
    for (cuts <- Seq(Seq.empty[Long], Seq(10L), Seq(10L, 20L))) {
      val m = ClusterView.overIndex("doc_id",
        DedupIndexView.maintainer("doc_id", "text", b = B, r = R,
                                  nGram = N),
        minEdgeScore = 0.5)
      val res = TableViews.replay(ev, cuts, Seq("doc_id"), Seq(m))
      val live = Materializer.liveView(res.state)
      val a = live.select(col("doc_id").cast("long").as("src"),
                          col("text").as("ta"))
      val b2 = live.select(col("doc_id").cast("long").as("dst"),
                           col("text").as("tb"))
      val edges = a.join(b2, col("src") < col("dst"))
        .filter(Dedup.ngramJaccard(col("ta"), col("tb"), N) >= 0.5)
        .select(col("src"), col("dst"))
      val comps = Dedup.connectedComponents(edges, "src", "dst",
                                            shufflePartitions = 4)
      val expect = live
        .select(col("doc_id").cast("long").as("doc_id"))
        .join(comps, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
                coalesce(col("component"), col("doc_id")).as("cluster"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(1) == r.getLong(0)))
        .toSet
      val got = ClusterView.view(res(m)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(got == expect,
        s"text clusters diverged from from-scratch CC with cuts=$cuts")
    }
  }

  test("dup groups: plant, promote representative on delete, dissolve") {
    val same = "identical corpus text planted three times over"
    def grp(lines: Seq[String]): Set[String] = {
      val m = TableViews.mapDelta(
        IncrementalAgg.distinctMaintainer("fp", "doc_id"))(
        DedupIndexView.withFingerprint("text"))
      val res = TableViews.replay(events(lines), Seq(10L, 20L),
                                  Seq("doc_id"), Seq(m))
      rowsOf(DedupIndexView.dupGroups(res(m))
        .select(col("n_docs"), col("rep_id")))
    }
    val base = Seq(
      doc("insert", 1, 1, same), doc("insert", 2, 2, same),
      doc("insert", 3, 3, same), doc("insert", 4, 4, metal))
    assert(grp(base) == Set("[3,1]"), "planted group must surface")
    // deleting the representative promotes the next-smallest id
    assert(grp(base :+ doc("delete", 11, 1, same)) == Set("[2,2]"),
      "rep must promote on delete")
    // an update moving doc 2 out dissolves the group below 2 members
    assert(grp(base ++ Seq(doc("delete", 11, 1, same),
                           doc("update", 21, 2, metal2,
                               old = Some(same)))).isEmpty,
      "group must dissolve under 2 members")
  }
}
