package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over a scale-factor directory; `oracleSql` holds the DuckDB
  * equivalent for the driver's correctness gate. Every query ends in a
  * deterministic ORDER BY so row-order-sensitive comparison is stable, and
  * float aggregates are rounded so IEEE summation-order differences between
  * engines cannot flip the hash.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the full CDC path: synthesize Maxwell changelog from
    * `orders` -> parse envelope -> typed decode -> materialize current
    * state -> aggregate by status. */
  def entry(spark: SparkSession): DataFrame =
    cdc.ChangelogGen.ordersState(spark, "/root/testdata/sf0.001")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("o_orderstatus"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.CdcQueries.queries ++
      ops.RelationalQueries.queries ++
      ops.FunctionQueries.queries ++
      ops.PipelineQueries.queries ++
      ops.CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.CdcQueries.oracle ++
      ops.RelationalQueries.oracle ++
      ops.FunctionQueries.oracle ++
      ops.PipelineQueries.oracle ++
      ops.CurationQueries.oracle
}
