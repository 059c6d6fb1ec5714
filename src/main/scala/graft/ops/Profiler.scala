package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the first query anyone runs against a
  * new 100 TB corpus drop: per column, row/null/distinct counts and the
  * numeric range. (The reference consumes fully-typed tables and never
  * needs this; it is table stakes for the curation pipelines the engine
  * targets, where "how null is this field, how wide, how many levels"
  * gates every downstream join/filter decision.)
  *
  * Two execution shapes, one output schema:
  *
  *  - `exact = false` (the 100 TB default): ONE scan, no value shuffle —
  *    per-column null counters + `approx_count_distinct` (HLL++) fold
  *    into a single aggregate row of partials, then the row pivots to
  *    per-column rows driver-side (|cols| rows, constant size).
  *  - `exact = true` (the oracle/verification path): values stack to
  *    (col_name, value) pairs and distinct-count in two phases — one
  *    shuffle on the pair key with map-side partials (never an
  *    |cols|-way `expand` of multiple COUNT DISTINCTs), then a
  *    |cols × distinct|-bounded rollup.
  *
  * Values are compared through their STRING image (column types vary per
  * row in the stacked shape) — injective for the primitive types, so
  * distinct counts are unchanged; the numeric range re-parses the image
  * with `try_cast` (non-numeric columns profile NULL bounds), and
  * double↔string round-trips are shortest-repr exact in both Spark and
  * DuckDB, which is what keeps the exact path oracle-comparable. */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = false): DataFrame =
    if (exact) profileExact(df, cols) else profileApprox(df, cols)

  private def vStr(c: String) = col(c).cast("string")
  // try_cast from the string image: uniform across input types (a direct
  // date->double cast would fail ANALYSIS, not runtime — try_cast only
  // forgives runtime parse errors)
  private def numOf(c: org.apache.spark.sql.Column) =
    c.try_cast("double")

  private def profileExact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), vStr(c).as("v"))): _*)).as("p"))
      .select(col("p.*"))
    // phase 1: collapse to distinct (col, value) with multiplicities —
    // map-side partials bound the shuffle by |cols| × |distinct values|
    val cnts = pairs.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    // phase 2: |cols|-bounded rollup; n_distinct counts the non-null
    // DISTINCT rows of phase 1 directly
    cnts.groupBy(col("col_name")).agg(
      sum(col("cnt")).as("n_rows"),
      coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
        .cast("long").as("n_nulls"),
      count(col("v")).as("n_distinct"),
      round(min(numOf(col("v"))), 4).as("min_num"),
      round(max(numOf(col("v"))), 4).as("max_num"))
      .orderBy(col("col_name"))
  }

  private def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      // rsd 2% (not the 5% default): the sketch is still ~KB-sized and
      // profiling exists to read the distinct counts
      approx_count_distinct(vStr(c), 0.02).as(s"__dist_$c"),
      min(numOf(vStr(c))).as(s"__min_$c"),
      max(numOf(vStr(c))).as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single partial row to |cols| output rows
    one.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"),
             col("__n").as("n_rows"),
             col(s"__nulls_$c").cast("long").as("n_nulls"),
             col(s"__dist_$c").as("n_distinct"),
             round(col(s"__min_$c"), 4).as("min_num"),
             round(col(s"__max_$c"), 4).as("max_num"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
