package graft.cdc

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained quality funnel's scan-side stage expression must
  * equal the batch operator's shuffle-based flags doc-for-doc, and the
  * maintained per-stage counts must equal a from-scratch recompute over
  * the live corpus — including a doc REWRITTEN ACROSS STAGES (the group
  * move the moments maintainer must retract and re-add exactly). */
class QualityFunnelSpec extends SparkSpec {

  /** The batch funnel's flag derivation (per-(doc, tok) shuffle), folded
    * to the deepest-stage-passed — the independent recompute. */
  private def batchStages(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val top = docs.select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"),
                                  sum(col("c")).as("n_tok"))
    docs.join(top, "doc_id")
      .select(col("doc_id"),
        when(!(col("n_tok") >= 30), 0)
          .when(!(length(regexp_replace(col("text"), "\\s+", ""))
                    .cast("double") / col("n_tok")).between(2.0, 10.0), 1)
          .when(!(col("top_c") * 5 <= col("n_tok")), 2)
          .when(!(array_contains(toks, "the") || array_contains(toks, "a")),
                3)
          .otherwise(4).as("stage"))
  }

  test("scan-side qualityStage == the batch shuffle derivation, sf corpus") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val scan = docs.select(col("doc_id"),
      TextAnalysis.qualityStage(col("text")).as("stage"))
    val diff = scan.join(batchStages(docs).withColumnRenamed("stage", "b"),
                         "doc_id")
      .filter(col("stage") =!= col("b"))
    assert(diff.isEmpty, s"stage mismatch: ${diff.head(5).mkString(", ")}")
    // the corpus must exercise more than one stage or the test is vacuous
    assert(scan.select(col("stage")).distinct().count() > 1)
  }

  test("5k-token docs: sort-and-scan top-token count stays exact") {
    import spark.implicits._
    // real web docs run 10^3-10^4 tokens — the regime where the old
    // distinct×filter fold went O(k²). Planted outcomes: d1 all-unique
    // + stopword (stage 4), d2 one token at ~21% (fails rule 3 ->
    // stage 2), d3 exactly at the 20% boundary — must PASS rule 3
    // (stage 4), d4 one token repeated 5000x (fails rule 3 -> stage 2).
    val uniq = (1 to 5000).map(i => s"tok$i")
    val d1 = (uniq :+ "the").mkString(" ")
    val d2 = ((1 to 4000).map(i => s"u$i" + "xx") ++
              Seq.fill(1050)("rep") :+ "the").mkString(" ")
    val d3 = ((1 to 4000).map(i => s"v$i" + "xx") ++
              Seq.fill(1000)("rep") :+ "the").mkString(" ")
    val d4 = (Seq.fill(5000)("aa") :+ "the").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.qualityStage(col("text")).as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 4, 2L -> 2, 3L -> 4, 4L -> 2),
      s"planted long-doc stages off: $got")
    // and doc-for-doc parity with the independent shuffle derivation
    val diff = docs.select(col("doc_id"),
        TextAnalysis.qualityStage(col("text")).as("stage"))
      .join(batchStages(docs).withColumnRenamed("stage", "b"), "doc_id")
      .filter(col("stage") =!= col("b"))
    assert(diff.isEmpty, s"long-doc mismatch: ${diff.head(5).mkString(",")}")
  }

  test("maintained funnel counts == recompute over live state, with a stage-moving rewrite") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // long texts pass rule 1; "the" decides rule 4; a repeated token
    // breaks rule 3; doc 2 is REWRITTEN from pass-all to stage-0
    // (short). Events go through the REAL Maxwell decode so the
    // before/changed_cols contract withDerived retracts through is the
    // production one.
    def longText(tag: String, stop: Boolean) =
      (1 to 30).map(i => s"$tag$i").mkString(" ") +
        (if (stop) " the" else " zz")
    val d2v1 = longText("b", stop = true)
    val d3 = longText("c", stop = false)
    def ins(ts: Long, id: Long, text: String) =
      s"""{"database":"d","table":"docs","type":"insert","ts":$ts,"data":{"doc_id":$id,"text":"$text"}}"""
    val lines = Seq(
      ins(1, 1, longText("a", stop = true)),
      ins(2, 2, d2v1),
      ins(3, 3, d3),
      ins(4, 4, "short text only"),
      ins(5, 5, ("rep " * 31).trim + " the"),
      s"""{"database":"d","table":"docs","type":"update","ts":11,"data":{"doc_id":2,"text":"now tiny"},"old":{"text":"$d2v1"}}""",
      s"""{"database":"d","table":"docs","type":"delete","ts":12,"data":{"doc_id":3,"text":"$d3"}}""")
    val spec = TableSpec("d", "docs", Seq("doc_id"), StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    val log = RowDecoder.changeEvents(
      lines.zipWithIndex.toDF("value", "seq")
        .select(from_json(col("value"), Maxwell.envelopeSchema).as("e"),
                col("seq").cast("long").as("seq"))
        .select(col("e.*"), col("seq")),
      spec)
    // value column is irrelevant (only n_rows is read) — the pk serves
    val m = TableViews.mapDelta(
      IncrementalAgg.momentsMaintainer("q_stage", "doc_id",
                                       _.cast("decimal(18,4)")))(
      TableViews.withDerived("text", "q_stage")(TextAnalysis.qualityStage))
    val res = TableViews.replay(log, cuts = Seq(10L), pk = Seq("doc_id"),
                                maintainers = Seq(m))
    val counts = IncrementalAgg.momentsView(res(m))
      .select(col("q_stage"), col("n_rows"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val live = Materializer.liveView(res.state)
    val expect = live
      .select(TextAnalysis.qualityStage(col("text")).as("s"))
      .groupBy(col("s")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(counts == expect,
      s"maintained stage counts $counts != live recompute $expect")
    // landmarks: d1 passes all (stage 4), d2 moved 4 -> 0, d3 deleted,
    // d4 stage 0, d5 fails repetition (stage 2)
    assert(expect == Map(4 -> 1, 0 -> 2, 2 -> 1))
  }
}
