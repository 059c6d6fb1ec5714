package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.ChangelogGen

/** CDC-core queries with closed-form SQL oracles over `orders` (the
  * changelog is deterministically synthesized FROM orders, so the
  * materialized state is expressible directly — see ChangelogGen's event
  * plan). These validate the entire reference-parity path: Maxwell JSON ->
  * envelope parse -> typed decode -> op routing -> materialization. */
object CdcQueries {

  /** The expected-state expression shared by oracle SQL strings. */
  private val expectedStateSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 1.1
      |       ELSE o_totalprice END AS o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey % 10 <> 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full replay -> current state (one row per surviving key).
    "cdc_materialize" -> ((s, dir) =>
      ChangelogGen.ordersState(s, dir).orderBy(col("o_orderkey"))),

    // Op-type routing counts straight off the parsed envelope (R6).
    "cdc_op_counts" -> ((s, dir) =>
      ChangelogGen.ordersChangeEvents(s, dir)
        .groupBy(col("op")).agg(count(lit(1)).as("n"))
        .orderBy(col("op"))),

    // Aggregate over materialized state: the flagship shape at sf scale.
    "cdc_state_agg" -> ((s, dir) =>
      ChangelogGen.ordersState(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy(col("o_orderstatus"))),

    // Incremental aggregate maintenance: revenue per status maintained
    // from changelog deltas alone — the base table is never re-read.
    // Deltas cast to decimal so the incremental sum is order-independent
    // and EXACTLY equals a recompute (no float-rounding boundary risk).
    "cdc_incr_agg" -> ((s, dir) =>
      graft.cdc.IncrementalAgg.sumCount(
          ChangelogGen.ordersChangeEvents(s, dir),
          groupCol = "o_orderstatus", valueCol = "o_totalprice",
          valueCast = _.cast("decimal(25,10)"))
        .select(col("o_orderstatus"),
                round(col("sum_o_totalprice"), 2).cast("double")
                  .as("total_price"),
                col("n_rows"))
        .orderBy(col("o_orderstatus"))),

    // Update events expose partial `before` (quirk Q3): the only non-null
    // column of `before` is the changed one. Verify its value relation.
    "cdc_update_before" -> ((s, dir) =>
      ChangelogGen.ordersChangeEvents(s, dir)
        .filter(col("op") === "update")
        .select(col("after.o_orderkey").as("o_orderkey"),
                col("before.o_totalprice").as("old_price"),
                col("after.o_totalprice").as("new_price"))
        .orderBy(col("o_orderkey"))))

  val oracle: Map[String, String] = Map(
    "cdc_materialize" ->
      s"""SELECT * FROM ($expectedStateSql) ORDER BY o_orderkey""",
    "cdc_op_counts" ->
      """SELECT op, n FROM (
        |  SELECT 'insert' AS op, count(*) AS n FROM orders
        |  UNION ALL
        |  SELECT 'update', count(*) FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT 'delete', count(*) FROM orders WHERE o_orderkey % 10 = 0
        |) ORDER BY op""".stripMargin,
    "cdc_state_agg" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM ($expectedStateSql)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "cdc_incr_agg" ->
      s"""SELECT o_orderstatus,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,10))), 2)
        |       AS DOUBLE) AS total_price,
        |  count(*) AS n_rows
        |FROM ($expectedStateSql)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "cdc_update_before" ->
      """SELECT o_orderkey, o_totalprice AS old_price,
        |  o_totalprice * 1.1 AS new_price
        |FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin)
}
