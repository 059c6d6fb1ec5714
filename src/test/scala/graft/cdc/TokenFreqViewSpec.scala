package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained token-frequency table must equal a from-scratch
  * tokenize-and-count over the live corpus after every prefix — exact
  * retraction of update/delete tokens included. */
class TokenFreqViewSpec extends SparkSpec {

  private def events(lines: Seq[String]): DataFrame =
    RowDecoder.changeEvents(
      Maxwell.parseEnvelope(
        spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)),
      ChangelogGen.documentsSpec)

  private def doc(op: String, ts: Long, id: Long, text: String,
                  old: Option[String] = None): String = {
    val o = old.map(t => s""","old":{"text":"$t"}""").getOrElse("")
    s"""{"database":"${ChangelogGen.Database}","table":"documents",""" +
      s""""type":"$op","ts":$ts,"data":{"doc_id":$id,"text":"$text",""" +
      s""""lang":"en","source":"t","n_chars":${text.length}}$o}"""
  }

  private def counts(lines: Seq[String], cuts: Seq[Long]): Map[String, Long] = {
    val m = TokenFreqView.maintainer("text")
    val res = TableViews.replay(events(lines), cuts, Seq("doc_id"), Seq(m))
    TokenFreqView.view(res(m)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exploded deltas fold to exact live token counts under update and delete") {
    val b1 = Seq(doc("insert", 1, 1, "a b b"), doc("insert", 2, 2, "b c"))
    assert(counts(b1, Seq.empty) == Map("a" -> 1L, "b" -> 3L, "c" -> 1L))
    // update retracts ONLY the before tokens ("a b b"), applies "c d"
    val b2 = b1 :+ doc("update", 11, 1, "c d", old = Some("a b b"))
    assert(counts(b2, Seq(10L)) ==
             Map("b" -> 1L, "c" -> 2L, "d" -> 1L),
      "update must retract before-tokens and apply after-tokens")
    // delete retracts the CURRENT text's tokens
    val b3 = b2 :+ doc("delete", 21, 2, "b c")
    assert(counts(b3, Seq(10L, 20L)) == Map("c" -> 1L, "d" -> 1L),
      "delete must retract the dead doc's tokens")
    // batching invariance: one batch == three batches
    assert(counts(b3, Seq.empty) == counts(b3, Seq(10L, 20L)))
  }

  test("distinct-token modality maintains exact document frequencies") {
    // df semantics: a token counts ONCE per live doc containing it,
    // however many times it occurs — the cdc_bm25 sufficient statistic
    def dfCounts(lines: Seq[String], cuts: Seq[Long]): Map[String, Long] = {
      val m = TokenFreqView.maintainer("text",
        t => array_distinct(graft.text.TextAnalysis.tokens(t)))
      val res = TableViews.replay(events(lines), cuts, Seq("doc_id"), Seq(m))
      TokenFreqView.view(res(m)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val b1 = Seq(doc("insert", 1, 1, "a b b"), doc("insert", 2, 2, "b c"))
    assert(dfCounts(b1, Seq.empty) == Map("a" -> 1L, "b" -> 2L, "c" -> 1L),
      "repeated occurrences within one doc must count once")
    // rewrite: doc 1 loses {a, b}, gains {c} — df must retract the
    // BEFORE text's distinct tokens exactly once each
    val b2 = b1 :+ doc("update", 11, 1, "c c", old = Some("a b b"))
    assert(dfCounts(b2, Seq(10L)) == Map("b" -> 1L, "c" -> 2L))
    // delete retracts the dead doc's distinct tokens
    val b3 = b2 :+ doc("delete", 21, 2, "b c")
    assert(dfCounts(b3, Seq(10L, 20L)) == Map("c" -> 1L))
    // batching invariance
    assert(dfCounts(b3, Seq.empty) == dfCounts(b3, Seq(10L, 20L)))
  }

  test("maintained document frequencies equal a from-scratch distinct count over the testdata live corpus") {
    val ev = ChangelogGen.documentsChangeEvents(spark, sfDir)
    val m = TokenFreqView.maintainer("text",
      t => array_distinct(graft.text.TextAnalysis.tokens(t)))
    val res = TableViews.replay(ev,
      Seq(ChangelogGen.DocT1, ChangelogGen.DocT2), Seq("doc_id"), Seq(m))
    val maintained = TokenFreqView.view(res(m))
    val scratch = Materializer.liveView(res.state)
      .select(col("doc_id"),
              explode(array_distinct(
                graft.text.TextAnalysis.tokens(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    assert(maintained.collect().map(_.toString).toSet ==
             scratch.collect().map(_.toString).toSet,
      "maintained document frequencies != from-scratch distinct count")
  }

  test("maintained counts equal a from-scratch count over the testdata live corpus") {
    val ev = ChangelogGen.documentsChangeEvents(spark, sfDir)
    val m = TokenFreqView.maintainer("text")
    val res = TableViews.replay(ev,
      Seq(ChangelogGen.DocT1, ChangelogGen.DocT2), Seq("doc_id"), Seq(m))
    val maintained = TokenFreqView.view(res(m))
    val scratch = Materializer.liveView(res.state)
      .select(explode(graft.text.TextAnalysis.tokens(col("text")))
        .as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    assert(maintained.collect().map(_.toString).toSet ==
             scratch.collect().map(_.toString).toSet,
      "maintained token counts != from-scratch tokenize-and-count")
  }
}
