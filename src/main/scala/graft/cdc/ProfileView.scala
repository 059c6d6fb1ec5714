package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained DATA-PROFILING view over a table changelog — the exact
  * profiler's stacked `(col_name, value, n)` multiplicity state
  * ([[graft.ops.Profiler]] phase 1) kept current from change-event
  * deltas alone, so the "how null / how wide / how many levels"
  * dashboard stays true as the table churns, exact under deletes where
  * the one-shot HLL profile cannot retract.
  *
  * Delta shape (UDTF-style, TokenFreqView's algebra over column images
  * instead of tokens): an insert contributes +1 per profiled column's
  * after-value, a delete −1 per after-value (quirk Q4: the dead row's
  * image rides in `after`), and an update touches ONLY its changed
  * columns — −1 for the before-value, +1 for the after-value, resolved
  * through the exact Maxwell partial-`old` contract (unchanged columns
  * net zero and never enter the shuffle). Values travel as their STRING
  * image (injective for the primitive types — Profiler's scaladoc walks
  * the double↔string round-trip argument), so one state serves every
  * column type.
  *
  * Scale shape: per batch the explode is |Δ| × |changed cols| and
  * collapses map-side to one row per touched (col, value) before the
  * shuffle; the persisted state is Σ|distinct values| rows and untouched
  * pairs pass through a broadcast anti join (`mergeAdditive`). The serve
  * rollup is |state|-bounded, never a table scan. */
object ProfileView {

  private[cdc] def valueDeltas(events: DataFrame, cols: Seq[String])
      : DataFrame = {
    require(events.columns.contains("changed_cols"),
      "ProfileView: events must carry changed_cols (decode with " +
        "RowDecoder.changeEvents) — exact retraction of an update's " +
        "before-values is impossible otherwise")
    def entry(c: String, v: Column, sign: Int): Column =
      struct(lit(c).as("col_name"), v.cast("string").as("v"),
             lit(sign.toLong).as("dc"))
    val insertRows = array(cols.map(c =>
      entry(c, col(s"after.$c"), 1)): _*)
    val deleteRows = array(cols.map(c =>
      entry(c, col(s"after.$c"), -1)): _*)
    // update: only columns listed in changed_cols move; NULL
    // changed_cols (raw `old` missing/malformed) must fail loudly —
    // silently treating it as "nothing changed" would freeze stale
    // values in the profile forever (TokenFreqView discipline).
    val emptyEntries =
      array().cast("array<struct<col_name:string,v:string,dc:bigint>>")
    val perColUpdate = cols.map { c =>
      when(col("changed_cols").isNull,
           raise_error(concat(
             lit("ProfileView: update event with NULL changed_cols " +
                 "(raw `old` missing or malformed JSON) — exact " +
                 "retraction impossible; event ts="),
             col("ts").cast("string"))))
        .when(array_contains(col("changed_cols"), c),
              array(entry(c, col(s"before.$c"), -1),
                    entry(c, col(s"after.$c"), 1)))
        .otherwise(emptyEntries)
    }
    val updateRows = concat(perColUpdate: _*)
    events.filter(col("op").isin("insert", "delete", "update"))
      .select(explode(
        when(col("op") === "insert", insertRows)
          .when(col("op") === "delete", deleteRows)
          .otherwise(updateRows)).as("d"))
      .select(col("d.col_name").as("col_name"), col("d.v").as("v"),
              col("d.dc").as("dc"))
      .groupBy(col("col_name"), col("v")).agg(sum(col("dc")).as("n"))
      .filter(col("n") =!= 0)
  }

  /** One micro-batch fold into the persisted `(col_name, v, n)` state. */
  def profileBatch(state: DataFrame, events: DataFrame, cols: Seq[String],
                   maxLocalKeys: Int = JoinView.DefaultMaxLocalKeys)
      : DataFrame =
    IncrementalAgg.mergeAdditive(state, valueDeltas(events, cols),
      Seq("col_name", "v"), Seq("n"), maxLocalKeys)

  /** The profile face: per column, live row/null/distinct counts and the
    * numeric range — [[graft.ops.Profiler]]'s exact phase-2 rollup over
    * the maintained multiplicities. */
  def view(state: DataFrame): DataFrame =
    state.filter(col("n") > 0)
      .groupBy(col("col_name")).agg(
        sum(col("n")).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("n"))), lit(0L))
          .cast("long").as("n_nulls"),
        count(col("v")).as("n_distinct"),
        round(min(col("v").try_cast("double")), 4).as("min_num"),
        round(max(col("v").try_cast("double")), 4).as("max_num"))

  def maintainer(cols: Seq[String]): TableViews.Maintainer[DataFrame] =
    new TableViews.Maintainer[DataFrame] {
      def empty(events0: DataFrame, pk: Seq[String]): DataFrame = {
        val spark = events0.sparkSession
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("col_name",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType))))
      }
      def step(st: DataFrame, ctx: TableViews.BatchCtx): DataFrame =
        profileBatch(st, ctx.delta, cols, ctx.maxLocalKeys)
      def pin(st: DataFrame): DataFrame = st.localCheckpoint(false)
      def reRoot(st: DataFrame, to: SparkSession): DataFrame =
        org.apache.spark.sql.graft.bridge.reRoot(st, to)
    }
}
