package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.MultiView

/** INCREMENTALLY MAINTAINED train/eval DECONTAMINATION — the two-sided
  * sibling of [[DedupIndexView]]: the batch operator (`q_decontaminate`,
  * flag corpus docs sharing any n-gram with a benchmark set) kept
  * current over TWO changelogs at once, the training corpus AND the
  * benchmark registry. Both sides churn in production: crawls rewrite
  * docs, new eval suites are released, old ones retire — and each
  * lifecycle must move the contamination set without rescanning the
  * corpus:
  *
  *   - a DOC change re-derives only that doc's grams and re-probes them
  *     against the live benchmark gram set (|Δdoc|-bounded);
  *   - a BENCHMARK change (the "new eval released" case) probes only
  *     the TOUCHED grams — the changed entries' old ∪ new grams —
  *     against the maintained inverted gram index, so unchanged docs
  *     gain or lose flags through an index lookup, never a corpus scan;
  *   - retiring an eval retracts its flags the same way, EXACTLY: a
  *     gram stays contaminating while ANY live benchmark entry still
  *     carries it, which the (b_id, gram) state decides locally.
  *
  * The contamination state is regenerated per TOUCHED GRAM wholesale —
  * the same provenance discipline as [[DedupIndexView]]'s touched
  * buckets (gram = bucket): carried rows are unchanged docs × untouched
  * grams, fresh rows are changed docs × the live bench gram set plus
  * unchanged docs × touched-and-live grams — three disjoint slices
  * whose union equals the from-scratch semi-join after every batch.
  *
  * Scale shape: the doc-side gram index is corpus-sized but is only
  * ever SCANNED against broadcast/salted key frames, never shuffled;
  * every gram-keyed join routes through [[MultiView.FkJoin]], so the
  * over-cap distributed fallback salts on the (id, gram) row key — a
  * stop-phrase gram shared by half the corpus cannot land on one
  * reducer of the AQE-off replay loop. This instantiation stores
  * LITERAL gram strings (what keeps the face oracle-exact against
  * DuckDB); at 100 TB the one-line swap is a hashed `gramsOf`
  * (`xxhash64(gram)`), which shrinks the index ~10× and changes
  * nothing in the algebra. */
object DecontamView {

  /** The maintained state: `docGrams` is the inverted gram index of the
    * live corpus (one (id, gram) row per DISTINCT gram per doc),
    * `benchGrams` the same over the live benchmark registry, `contam`
    * the contamination set — exactly the docGrams rows whose gram
    * appears in ≥ 1 live benchmark entry. `contam` is what makes serve
    * O(|contamination|): without it the face would re-scan the corpus
    * index per read. */
  final case class DecontamState(docGrams: DataFrame, benchGrams: DataFrame,
                                 contam: DataFrame)

  /** The decontamination view as a [[MultiView.Maintainer]] — registers
    * on a two-topic shared replay (L = the corpus table, R = the
    * benchmark table; the replay's `lJoinCols` fk surface is unused —
    * this view joins the sides by GRAM, not by key — so callers pass
    * the L pk there). `docText`/`benchText` are tokenized into word
    * `nGram`-shingles ([[Dedup.shingles]] — short texts fall back to a
    * single whole-string gram on both engines). */
  def maintainer(docText: String, benchText: String, nGram: Int = 5)
      : MultiView.Maintainer[DecontamState] =
    grammed(
      (live, id) => live.select(col(id),
        explode(array_distinct(Dedup.shingles(col(docText), nGram)))
          .as("gram")),
      (live, id) => live.select(col(id),
        explode(array_distinct(Dedup.shingles(col(benchText), nGram)))
          .as("gram")))

  /** The 100 TB knob: [[maintainer]] with 64-bit HASHED grams — the
    * index shrinks ~10× (a long per gram instead of an n-token string)
    * and every join keys on a fixed-width column; the algebra is
    * unchanged. Counts can differ from the literal-gram view only on an
    * xxhash64 collision between a doc gram and a bench gram
    * (~n²/2⁶⁴ — negligible at any realistic registry size), so this
    * variant trades the DuckDB-exact oracle for scale; the spec pins it
    * count-identical to the literal maintainer on the test corpus. */
  def hashedMaintainer(docText: String, benchText: String, nGram: Int = 5)
      : MultiView.Maintainer[DecontamState] = {
    def hashed(textCol: String)(live: DataFrame, id: String): DataFrame =
      live.select(col(id),
          explode(array_distinct(Dedup.shingles(col(textCol), nGram)))
            .as("__g"))
        .select(col(id), xxhash64(col("__g")).as("gram"))
    grammed(hashed(docText), hashed(benchText))
  }

  /** Cap-check a DERIVED frame before it may be broadcast: under the
    * cap → a driver-local frame (cheap to broadcast, and the probe
    * doubles as its pin); over → pinned distributed frame and the
    * caller takes the salted path. Same discipline as ClusterView's —
    * a frame derived from a capped key set (grams per changed entry)
    * is NOT itself capped and must not inherit the keys' locality. */
  private def capLocal(df: DataFrame, cap: Int): (DataFrame, Boolean) = {
    // pin FIRST, probe the pinned frame: the probe's partial scan then
    // lands in the checkpoint blocks, so the over-cap branch reuses
    // what the probe computed instead of recomputing the derived frame
    // from scratch. Under the cap the LocalRelation replaces the pin
    // and the ContextCleaner reaps its (tiny, <= cap rows) blocks when
    // the frame goes out of scope — an explicit unpersist here would
    // only trade that for a can't-recompute WARN per batch.
    val pinned = df.localCheckpoint(false)
    val rows = pinned.limit(cap + 1).collect().toSeq
    if (rows.size > cap) (pinned, false)
    else (df.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, df.schema),
      true)
  }

  /** Scan-side BLOOM prefilter for the over-cap index probe: when the
    * touched-live gram set is too big to broadcast exactly, the salted
    * semi would otherwise exchange the CORPUS-SIZED gram index — the
    * one shuffle the view's scale contract forbids. A broadcast bloom
    * of the key set reduces the index to candidate rows (matches +
    * ~0.1% false positives) BEFORE the exchange; the exact salted semi
    * downstream removes the false positives, so the result is
    * unchanged and the shuffle stays release-bounded. The bloom build
    * collects nothing row-wise — `stat.bloomFilter` aggregates to a
    * few-MB bitset even for millions of grams. */
  private def bloomPruned(index: DataFrame, keys: DataFrame,
                          keyCol: String): DataFrame = {
    val n = math.max(keys.count(), 1L)
    val bf = keys.stat.bloomFilter(keyCol, n, 0.001)
    val bc = index.sparkSession.sparkContext.broadcast(bf)
    val pred = index.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        udf((g: java.lang.Long) => g != null && bc.value.mightContainLong(g))
      case _ =>
        udf((g: String) => g != null && bc.value.mightContainString(g))
    }
    index.filter(pred(col(keyCol)))
  }

  /** The shared skeleton, gram derivation abstracted: `gramsL`/`gramsR`
    * turn live rows into (pk, gram) rows — literal shingles here, a
    * hashed or normalized variant at scale. */
  def grammed(gramsL: (DataFrame, String) => DataFrame,
              gramsR: (DataFrame, String) => DataFrame)
      : MultiView.Maintainer[DecontamState] =
    new MultiView.Maintainer[DecontamState] {

      def empty(liveL0: DataFrame, liveR0: DataFrame,
                lPk: Seq[String], rPk: Seq[String],
                lJoinCols: Seq[String]): DecontamState = {
        require(lPk.size == 1 && rPk.size == 1,
          s"decontam view requires single-column pks, got $lPk / $rPk")
        val spark = liveL0.sparkSession
        def emptyDf(df: DataFrame) = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
        val dg = emptyDf(gramsL(liveL0, lPk.head))
        DecontamState(dg, emptyDf(gramsR(liveR0, rPk.head)), dg)
      }

      def step(st: DecontamState, ctx: MultiView.BatchCtx): DecontamState = {
        val dId = ctx.lPk.head
        val bId = ctx.rPk.head
        // empty-side SHORT-CIRCUITS (free driver checks on the capped
        // local key sets): a bench-only batch — the "new eval released"
        // shape — must not patch or re-scan the corpus-side state at
        // all, and a doc-only batch must skip the touched-gram
        // machinery; each side's plan is built only when its delta is
        // (possibly) non-empty
        val lEmpty = ctx.lLocal && ctx.changedL.isEmpty
        val rEmpty = ctx.rLocal && ctx.changedR.isEmpty
        // salted-over-cap gram joins: rows of an (id, gram) frame are
        // unique per (id, gram), so that pair is the salt key
        def byGram(rowKey: String) =
          MultiView.FkJoin(Seq(rowKey, "gram"), Seq("gram"), Seq("gram"))
        // FROM-EMPTY (bootstrap) fold: both indexes ARE the batch's gram
        // derivations, nothing carries or retracts, and the index probe
        // is empty (every doc is changed) — the contamination set is one
        // salted semi of the fresh doc grams against the fresh bench
        // gram set; the touched-gram capLocal chains and patch joins
        // drop out (bridge.staticallyEmpty contract: plan-only).
        val bbr = org.apache.spark.sql.graft.bridge
        if (bbr.staticallyEmpty(st.docGrams) &&
            bbr.staticallyEmpty(st.benchGrams) &&
            bbr.staticallyEmpty(st.contam)) {
          val docGrams1 = gramsL(ctx.liveL, dId).localCheckpoint(false)
          val benchGrams1 = gramsR(ctx.liveR, bId).localCheckpoint(false)
          return DecontamState(docGrams1, benchGrams1,
            byGram(dId).filterByRKeys(
              docGrams1, benchGrams1.select(col("gram")).distinct(),
              rIsLocal = false, "left_semi"))
        }
        // |Δ|-bounded gram derivations, PINNED — the expensive per-batch
        // work (tokenize + shingle the changed rows) runs once per batch,
        // not once per consuming subtree
        val changedDocGrams = gramsL(
          ctx.liveL.join(ctx.hinted(ctx.changedL, ctx.lLocal),
                         Seq(dId), "left_semi"), dId)
          .localCheckpoint(false)
        val changedBenchGrams = gramsR(
          ctx.liveR.join(ctx.hinted(ctx.changedR, ctx.rLocal),
                         Seq(bId), "left_semi"), bId)
          .localCheckpoint(false)
        // patch both indexes: drop changed ids' old grams (deleted rows
        // contribute none), append the re-derived ones — pk-keyed anti
        // joins against the pinned state scans, the index never shuffles
        val docGrams1 =
          if (lEmpty) st.docGrams
          else st.docGrams
            .join(ctx.hinted(ctx.changedL, ctx.lLocal), Seq(dId),
                  "left_anti")
            .unionByName(changedDocGrams)
        val benchGrams1 =
          if (rEmpty) st.benchGrams
          else st.benchGrams
            .join(ctx.hinted(ctx.changedR, ctx.rLocal), Seq(bId),
                  "left_anti")
            .unionByName(changedBenchGrams)
        // carried rows start from the unchanged docs' contamination
        val carried0 =
          if (lEmpty) st.contam
          else st.contam.join(ctx.hinted(ctx.changedL, ctx.lLocal),
                              Seq(dId), "left_anti")
        val contam1 =
          if (rEmpty) {
            // no bench movement: contamination can only change for the
            // changed docs, re-probed against the (unchanged) live
            // bench gram set. The gram set is state-sized, never
            // broadcast by contract, so the semi is always SALTED —
            // the small side replicates across the salt buckets and a
            // hot gram in the delta spreads.
            if (lEmpty) st.contam
            else carried0.unionByName(byGram(dId).filterByRKeys(
              changedDocGrams,
              benchGrams1.select(col("gram")).distinct(),
              rIsLocal = false, "left_semi"))
          } else {
            // TOUCHED grams — the changed bench entries' old ∪ new
            // grams: the only grams whose is-contaminating status can
            // have moved. ctx.rLocal certifies only that the changed-R
            // KEY set is under the cap; a gram frame is |changedR| ×
            // grams-per-entry — unbounded for long benchmark text — so
            // each derived frame earns its OWN broadcast eligibility
            // (the capLocal discipline) before the broadcast-vs-salt
            // choice in filterByRKeys.
            val (touched, touchedLocal) = capLocal(
              st.benchGrams
                .join(ctx.hinted(ctx.changedR, ctx.rLocal), Seq(bId),
                      "left_semi")
                .select(col("gram"))
                .unionByName(changedBenchGrams.select(col("gram")))
                .distinct(),
              ctx.maxLocalKeys)
            // of those, the ones still carried by ≥ 1 live bench entry
            val (touchedLive, touchedLiveLocal) = capLocal(
              byGram(bId)
                .filterByRKeys(benchGrams1, touched, touchedLocal,
                               "left_semi")
                .select(col("gram")).distinct(),
              ctx.maxLocalKeys)
            // carried: unchanged docs × untouched grams — their doc
            // grams and the grams' bench membership are both unchanged
            val carried = byGram(dId).filterByRKeys(
              carried0, touched, touchedLocal, "left_anti")
            // unchanged docs × touched-and-live grams: the INDEX PROBE
            // — the path that flags/unflags docs no batch event
            // mentioned. Over-cap, the corpus-sized index is bloom-
            // pruned scan-side first so the salted semi exchanges only
            // candidate rows, never the whole index.
            val probeIdx =
              if (touchedLiveLocal) docGrams1
              else bloomPruned(docGrams1, touchedLive, "gram")
            val freshGram = byGram(dId)
              .filterByRKeys(probeIdx, touchedLive, touchedLiveLocal,
                             "left_semi")
              .join(ctx.hinted(ctx.changedL, ctx.lLocal), Seq(dId),
                    "left_anti")
            if (lEmpty) carried.unionByName(freshGram)
            else carried
              .unionByName(byGram(dId).filterByRKeys(
                changedDocGrams,
                benchGrams1.select(col("gram")).distinct(),
                rIsLocal = false, "left_semi"))
              .unionByName(freshGram)
          }
        DecontamState(docGrams1, benchGrams1, contam1)
      }

      def pin(st: DecontamState): DecontamState =
        DecontamState(st.docGrams.localCheckpoint(false),
                      st.benchGrams.localCheckpoint(false),
                      st.contam.localCheckpoint(false))

      def reRoot(st: DecontamState, to: SparkSession): DecontamState = {
        val bb = org.apache.spark.sql.graft.bridge
        DecontamState(bb.reRoot(st.docGrams, to),
                      bb.reRoot(st.benchGrams, to),
                      bb.reRoot(st.contam, to))
      }
    }

  /** The contamination face: per live doc, how many of its distinct
    * grams appear anywhere in the live benchmark registry (union-set
    * semantics — a gram in two suites counts once, matching the batch
    * operator). Docs with no overlap are absent. `idCol` is the corpus
    * pk column carried through the state. */
  def contaminated(st: DecontamState, idCol: String): DataFrame =
    st.contam.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))

  /** The SUITE-IMPACT face — "which eval is most compromised": per
    * value of `suiteCol` (an attribute of the live benchmark table),
    * how many live docs share ≥ 1 gram with that suite's entries.
    * Serve-side derivation off the SAME maintained state: the
    * contamination rows re-join the bench gram index by gram to
    * recover provenance (a contam gram is live in the bench index by
    * construction), so no extra state is maintained — and both join
    * inputs are contamination-sized/bench-sized, never the corpus. */
  def suiteImpact(st: DecontamState, liveBench: DataFrame, bIdCol: String,
                  suiteCol: String, idCol: String): DataFrame =
    st.contam
      .join(st.benchGrams, Seq("gram"))
      .join(liveBench.select(col(bIdCol), col(suiteCol)), Seq(bIdCol))
      .select(col(suiteCol), col(idCol)).distinct()
      .groupBy(col(suiteCol))
      .agg(count(lit(1)).as("n_docs"))
}
