package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md "skewed keys -> salting or AQE").
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) covers joins at runtime; explicit salting remains the tool for
  * AGGREGATIONS over pathological key distributions — a single hot key
  * otherwise lands on one reducer no matter how many executors exist.
  *
  * `saltedAgg` is two-phase: partial aggregate on (key, salt) spreads the
  * hot key over `saltBuckets` reducers, final aggregate on key combines
  * the partials. Works for any algebraic aggregate (sum/count/min/max);
  * averages decompose as sum+count.
  */
object Skew {

  /** Deterministic salt in [0, saltBuckets): hash of the whole row spread,
    * not random — keeps replays identical. */
  private def salt(saltBuckets: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(saltBuckets.toLong))

  /** Salted sum/count aggregation: `agg` maps output column name ->
    * (valueColumn, "sum"|"count"|"min"|"max"). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Map[String, (Column, String)]): DataFrame = {
    val allCols = df.columns.map(col).toSeq
    val salted = df.withColumn("__salt", salt(saltBuckets, allCols))
    val partialAggs = aggs.toSeq.map { case (name, (c, kind)) =>
      (kind match {
        case "sum"   => sum(c)
        case "count" => count(c)
        case "min"   => min(c)
        case "max"   => max(c)
      }).as(s"__p_$name")
    }
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = aggs.toSeq.map { case (name, (_, kind)) =>
      (kind match {
        case "sum" | "count" => sum(col(s"__p_$name"))
        case "min"           => min(col(s"__p_$name"))
        case "max"           => max(col(s"__p_$name"))
      }).as(name)
    }
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast-side replication for a skewed join: replicate the
    * small side `saltBuckets` times with an explicit salt column, salt the
    * big side's rows, join on (key, salt). Use when AQE can't help (e.g.
    * the skew is in a stream-static join). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      salt(saltBuckets, big.columns.map(col).toSeq))
    val smallRep = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    bigSalted.join(smallRep, Seq(key, "__salt")).drop("__salt")
  }
}
