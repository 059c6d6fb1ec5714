package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scalar-function inventory (string/date/math/json/array) — filled in
  * stage 2. */
object FunctionQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
