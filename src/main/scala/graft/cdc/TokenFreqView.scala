package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained TOKEN-FREQUENCY table over a text-corpus changelog — the
  * UDTF-shaped view maintenance the row-level maintainers can't express:
  * each change event EXPLODES into ±1 deltas per token occurrence
  * (insert: +1 per token of the new text; delete: −1 per token of the
  * dead text; update: −1 per before-token, +1 per after-token, with the
  * before text resolved through the exact Maxwell partial-`old`
  * contract). The folded state `(token, n)` carries total live
  * occurrences and is exact under deletes and out-of-order batches —
  * the additive fold keeps negative partials so a delete arriving
  * before its insert cancels exactly (Materializer discipline).
  *
  * Scale shape: per batch the explode is |Δ docs| × tokens-per-doc and
  * collapses map-side to one row per touched token BEFORE the shuffle;
  * the persisted state is vocabulary-bounded and untouched tokens pass
  * through a broadcast anti join unchanged (`mergeAdditive`). The corpus
  * itself is never re-tokenized — this is `q_token_freq`'s aggregate
  * kept current by deltas alone. */
object TokenFreqView {

  private def tokenDeltas(events: DataFrame, textCol: String,
                          tokensOf: Column => Column): DataFrame = {
    require(events.columns.contains("changed_cols"),
      "TokenFreqView: events must carry changed_cols (decode with " +
        "RowDecoder.changeEvents) — exact retraction of an update's " +
        "before-tokens is impossible otherwise")
    val afterToks = tokensOf(col(s"after.$textCol"))
    val beforeToks = tokensOf(
      when(col("changed_cols").isNull,
           raise_error(concat(
             lit("TokenFreqView: update event with NULL changed_cols " +
                 "(raw `old` missing or malformed JSON) — exact " +
                 "retraction impossible; event ts="),
             col("ts").cast("string"))))
        .when(array_contains(col("changed_cols"), textCol),
              col(s"before.$textCol"))
        .otherwise(col(s"after.$textCol")))
    def signed(toks: Column, sign: Int): Column =
      transform(toks, t => struct(t.as("token"), lit(sign.toLong).as("dc")))
    events.filter(col("op").isin("insert", "delete", "update"))
      .select(explode(
        when(col("op") === "insert", signed(afterToks, 1))
          .when(col("op") === "delete", signed(afterToks, -1))
          .otherwise(concat(signed(beforeToks, -1), signed(afterToks, 1))))
        .as("d"))
      .select(col("d.token").as("token"), col("d.dc").as("dc"))
      .groupBy(col("token")).agg(sum(col("dc")).as("n"))
      .filter(col("n") =!= 0)
  }

  /** One micro-batch fold: the batch's net per-token deltas into the
    * persisted `(token, n)` state. */
  def tokenFreqBatch(state: DataFrame, events: DataFrame, textCol: String,
                     tokensOf: Column => Column,
                     maxLocalKeys: Int = JoinView.DefaultMaxLocalKeys)
      : DataFrame =
    IncrementalAgg.mergeAdditive(state,
      tokenDeltas(events, textCol, tokensOf),
      Seq("token"), Seq("n"), maxLocalKeys)

  /** Live view: tokens with at least one live occurrence. */
  def view(state: DataFrame): DataFrame = state.filter(col("n") > 0)

  /** The maintained token-frequency table as a
    * [[TableViews.Maintainer]] — registers on the shared documents
    * fan-out next to the dedup index and the corpus-health views.
    * `tokensOf` defaults to the whitespace tokenizer every pipeline
    * operator uses. */
  def maintainer(textCol: String,
                 tokensOf: Column => Column =
                   graft.text.TextAnalysis.tokens)
      : TableViews.Maintainer[DataFrame] =
    new TableViews.Maintainer[DataFrame] {
      def empty(events0: DataFrame, pk: Seq[String]): DataFrame = {
        val spark = events0.sparkSession
        val tokT = events0
          .select(tokensOf(col(s"after.$textCol")).getItem(0))
          .schema.head.dataType
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("token", tokT),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType))))
      }
      def step(st: DataFrame, ctx: TableViews.BatchCtx): DataFrame =
        tokenFreqBatch(st, ctx.delta, textCol, tokensOf, ctx.maxLocalKeys)
      def pin(st: DataFrame): DataFrame = st.localCheckpoint(false)
      def reRoot(st: DataFrame, to: SparkSession): DataFrame =
        org.apache.spark.sql.graft.bridge.reRoot(st, to)
    }
}
