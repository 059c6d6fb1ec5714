package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star LLM-data-pipeline operators (dedup, similarity, text
  * analysis) — filled in stage 4. */
object PipelineQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
