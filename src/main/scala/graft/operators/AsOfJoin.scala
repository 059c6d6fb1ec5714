package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with the same key and `rightTs <= leftTs` — the canonical enrichment
  * of an event stream with slowly-changing state (prices, profiles,
  * dimension versions). Spark has no built-in; per the custom-operator
  * preference order (SURVEY.md §2.2 / guide), this COMPOSES built-ins
  * rather than adding a planner node:
  *
  *   union(tagged left, tagged right)
  *     -> window last(rightPayload, ignoreNulls) over
  *        (partition by key order by ts, side rows unbounded..current)
  *     -> keep left rows
  *
  * Execution shape: ONE hash-partition shuffle of both sides on the key +
  * a per-partition sort — identical to what a native sort-merge as-of
  * join would do, so there is nothing for a custom SparkPlan to save.
  * Ties: a right row AT the left timestamp matches (inclusive, DuckDB
  * ASOF semantics) — right rows sort before left rows at equal ts.
  * Right rows must be unique per (key, ts); pre-aggregate if not.
  */
object AsOfJoin {

  /** @param left       event side; all its columns are kept
    * @param right      state side; `payload` columns are appended
    * @param key        equi-join key column name (present on both sides)
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param payload    right columns to carry (NULL when no match yet) */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           payload: Seq[String]): DataFrame = {
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"asOf: payload columns ${collisions.mkString(", ")} collide with " +
        "left columns — the result would carry duplicate names, breaking " +
        "by-name access; rename or suffix them on the right side first")
    val leftCols = left.columns.toSeq
    val paySchema = right.select(payload.map(col): _*).schema
    val pay = struct(payload.map(col): _*)
    // join (not window-grouping) semantics for NULL keys: a NULL-key left
    // row matches nothing; NULL-key right rows match no one. Segregate
    // them so the window partition can't pair NULL with NULL.
    val l = left.filter(col(key).isNotNull).select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(paySchema).as("__r"))
    val r = right.filter(col(key).isNotNull).select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(left.select(leftCols.map(col): _*).schema).as("__l"),
      pay.as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
              payload.map(c => col(s"__match.$c").as(c)): _*)
    val nullKeyLeft = left.filter(col(key).isNull).select(
      leftCols.map(col) ++ payload.zipWithIndex.map { case (c, i) =>
        lit(null).cast(paySchema.fields(i).dataType).as(c) }: _*)
    matched.unionByName(nullKeyLeft)
  }
}
