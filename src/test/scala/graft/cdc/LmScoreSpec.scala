package graft.cdc

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** The maintained LM face must equal a from-scratch bigram LM over the
  * live corpus, and the unseen-bigram smoothing branch must be proven
  * on a fixture where a probe bigram is GENUINELY absent from the live
  * corpus (fixed probes outlive the docs they came from). */
class LmScoreSpec extends SparkSpec {

  test("maintained LM score == from-scratch live LM at sf") {
    val face = graft.ops.CdcQueries.queries("cdc_lm_score")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val live = Materializer.currentState(
      ChangelogGen.documentsChangeEvents(spark, sfDir), Seq("doc_id"))
    val t = TextAnalysis.tokens(col("text"))
    val lbg = live.select(explode(TextAnalysis.bigrams(t)).as("bg"))
    val cbg = lbg.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    val ctx = cbg.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("cnt")).as("ctx_n"))
    val v = live.select(explode(t).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val probes = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 10)
      .select(col("doc_id"), explode(TextAnalysis.bigrams(t)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
    val expect = probes
      .join(cbg, Seq("bg"), "left")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bg"),
           round(-sum(col("tf").cast("double") *
                      log((coalesce(col("cnt"), lit(0L)) + 1)
                            .cast("double") /
                          (coalesce(col("ctx_n"), lit(0L)) + col("v")))) /
                   sum(col("tf")),
                 4).as("nll"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(face == expect, "maintained LM face != from-scratch live LM")
  }

  test("serve plan reads zero parquet: probes pinned, model served off state") {
    // the probe frame is fixed (the cdc_ann_topk discipline) and the
    // LM's sufficient statistics are maintained states — a serve that
    // rescans the documents parquet to re-derive either would re-bill
    // one-time work to every read of the churning model
    val face = graft.ops.CdcQueries.queries("cdc_lm_score")(spark, sfDir)
    face.count() // force the pinned builds, then inspect a fresh plan
    val again = graft.ops.CdcQueries.queries("cdc_lm_score")(spark, sfDir)
    val scans = again.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("Scan parquet"))
    assert(scans.isEmpty,
      s"cdc_lm_score serve rescans parquet:\n${scans.mkString("\n")}")
  }

  test("unseen-bigram smoothing: a probe outliving its doc scores exactly") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // d1 "aa bb cc" is REWRITTEN to "ee ff"; the probe is d1's ORIGINAL
    // text, so its bigram "aa bb" is absent from the live corpus
    // (cnt=0, ctx(aa)=0) while "bb cc" survives via d2 = "bb cc dd".
    // Live: bigrams {ee ff, bb cc, cc dd} ×1, V = 5 (ee ff bb cc dd).
    // nll = -(ln(1/5) + ln(2/6)) / 2 = 1.3540.
    val lines = Seq(
      """{"database":"d","table":"docs","type":"insert","ts":1,"data":{"doc_id":1,"text":"aa bb cc"}}""",
      """{"database":"d","table":"docs","type":"insert","ts":2,"data":{"doc_id":2,"text":"bb cc dd"}}""",
      """{"database":"d","table":"docs","type":"update","ts":11,"data":{"doc_id":1,"text":"ee ff"},"old":{"text":"aa bb cc"}}""")
    val spec = TableSpec("d", "docs", Seq("doc_id"), StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    val ev = RowDecoder.changeEvents(
      lines.zipWithIndex.toDF("value", "seq")
        .select(from_json(col("value"), Maxwell.envelopeSchema).as("e"),
                col("seq").cast("long").as("seq"))
        .select(col("e.*"), col("seq")),
      spec)
    val uni = TokenFreqView.maintainer("text")
    val bg = TokenFreqView.maintainer("text",
      t => TextAnalysis.bigrams(TextAnalysis.tokens(t)))
    val res = TableViews.replay(ev, cuts = Seq(10L), pk = Seq("doc_id"),
                                maintainers = Seq(uni, bg))
    val probes = Seq((1L, "aa bb", 1L), (1L, "bb cc", 1L))
      .toDF("doc_id", "bg", "tf")
    val out = LmView.score(probes, "doc_id",
        TokenFreqView.view(res(bg)), TokenFreqView.view(res(uni)))
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L, "n_bg")
    assert(out(0).getDouble(2) == 1.3540,
      s"smoothed nll = ${out(0).getDouble(2)}, expected 1.3540")
  }
}
