package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Relational operator inventory (SURVEY.md §2.2): scans/filter/project,
  * joins (broadcast/semi/anti/outer/theta), aggregations (incl. distinct,
  * rollup, cube), window functions (ranking/analytic/frames), sort/limit,
  * set ops. All Catalyst built-ins — filters and projections push into the
  * parquet scan; small dimension tables are explicitly `broadcast()` so the
  * plan at 100 TB has no shuffle on the dimension side.
  *
  * Determinism conventions (driver hash-compares against DuckDB):
  *  - every query ends in a total-order ORDER BY;
  *  - float AGGREGATES are rounded (summation order differs between
  *    engines); per-row float arithmetic is left exact (same IEEE ops).
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- scan / filter / project (predicate + projection pushed to parquet)
    "q_filter_project" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
                col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // -- aggregation: TPC-H Q1 shape (map-side partial agg, 1 shuffle)
    "q_agg_basic" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
             round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
             round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
               .as("sum_disc_price"),
             round(avg(col("l_quantity")), 6).as("avg_qty"),
             round(avg(col("l_discount")), 6).as("avg_disc"),
             count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // -- distinct aggregation
    "q_agg_distinct" -> ((s, dir) =>
      load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))),

    // -- rollup (coalesce the grouping nulls away for stable compare)
    "q_agg_rollup" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val n = load(s, dir, "nation")
      val r = load(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             round(sum(col("c_acctbal")), 2).as("sum_bal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
                coalesce(col("n_name"), lit("ALL")).as("n_name"),
                col("n_cust"), col("sum_bal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // -- cube
    "q_agg_cube" -> ((s, dir) =>
      load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             round(sum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
                col("n"), col("total"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))),

    // -- arbitrary grouping sets (beyond rollup/cube lattices)
    "q_agg_grouping_sets" -> ((s, dir) =>
      load(s, dir, "customer")
        .groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey")), Seq()),
          col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
             round(sum(col("c_acctbal")), 2).as("bal"))
        .select(coalesce(col("c_mktsegment"), lit("ALL")).as("seg"),
                coalesce(col("c_nationkey").cast("string"), lit("ALL"))
                  .as("nk"),
                col("n"), col("bal"))
        .orderBy(col("seg"), col("nk"))),

    // -- value-based RANGE window frame (peers included by value, so the
    //    result is deterministic even with order-by ties)
    "q_window_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-10000L, Window.currentRow)
      load(s, dir, "orders")
        .select(col("o_orderkey"),
                round(sum(col("o_totalprice")).over(w), 2).as("rsum"))
        .orderBy(col("o_orderkey"))
    }),

    // -- two-phase salted aggregation (skew handling as a named, graded
    // op): lineitem grouped by l_returnflag is the pathological shape — 3
    // hot keys, so an unsalted final agg lands each on ONE reducer no
    // matter the cluster size. Skew.saltedAgg spreads each key over 32
    // salt buckets (map-side partial -> |keys|×32 shuffle rows -> final
    // combine). Decimal casts make the two-phase sum EXACTLY equal the
    // oracle's one-phase sum regardless of combine order.
    "q_agg_salted" -> ((s, dir) =>
      Skew.saltedAgg(
          load(s, dir, "lineitem")
            .select(col("l_returnflag"), col("l_orderkey"),
                    col("l_quantity").cast("decimal(25,10)").as("qty"),
                    col("l_extendedprice").cast("decimal(25,10)").as("price")),
          keys = Seq("l_returnflag"), saltBuckets = 32,
          aggs = Map(
            "sum_qty" -> (col("qty"), "sum"),
            "sum_price" -> (col("price"), "sum"),
            "n_rows" -> (lit(1), "count"),
            "max_okey" -> (col("l_orderkey"), "max")))
        .select(col("l_returnflag"),
                round(col("sum_qty"), 2).cast("double").as("sum_qty"),
                round(col("sum_price"), 2).cast("double").as("sum_price"),
                col("n_rows"), col("max_okey"))
        .orderBy(col("l_returnflag"))),

    // -- boolean + conditional aggregates
    "q_bool_agg" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(bool_and(col("l_quantity") > 0).as("all_pos_qty"),
             bool_or(col("l_discount") > 0.09).as("any_big_disc"),
             count_if(col("l_tax") > 0.05).as("n_tax"))
        .orderBy(col("l_returnflag"))),

    // -- broadcast equi-join (dimension side never shuffles)
    "q_join_broadcast" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val n = load(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             round(avg(col("c_acctbal")), 4).as("avg_bal"))
        .orderBy(col("n_name"))
    }),

    // -- multi-way join: revenue per nation (TPC-H Q5 shape).
    //    Fact-fact join shuffles on the key. Broadcast hints ONLY on the
    //    genuinely-constant dims (nation: 25 rows, region: 5 — fixed at
    //    every scale factor); customer/supplier GROW with SF (multi-GB at
    //    SF100), so AQE sizes those joins at runtime instead of a hint
    //    forcing an OOM-prone broadcast at 100x.
    "q_join_multi" -> ((s, dir) => {
      val cu = load(s, dir, "customer"); val o = load(s, dir, "orders")
      val l = load(s, dir, "lineitem"); val su = load(s, dir, "supplier")
      val n = load(s, dir, "nation"); val r = load(s, dir, "region")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .join(cu, o("o_custkey") === cu("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), cu("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
               .as("revenue"))
        .orderBy(col("n_name"))
    }),

    // -- bucketed co-located join: both sides written bucketBy(custkey)
    //    once per (session, sf) by [[BucketedTables.ensure]] (setup step,
    //    outside the query proper), then joined WITHOUT any shuffle — the
    //    bucket layout IS the partitioning, so the exchange disappears
    //    from the plan (asserted in ScaleSpec). This is the 100 TB recipe
    //    for repeated fact-dim joins on a stable key: pay the layout once
    //    at write time, join shuffle-free forever after.
    "q_join_bucketed" -> ((s, dir) => {
      val (bo, bc) = BucketedTables.ensure(s, dir)
      val o = s.table(bo); val c = s.table(bc)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_nationkey"))
    }),

    // -- semi join: customers that have at least one order
    "q_join_semi" -> ((s, dir) => {
      val c = load(s, dir, "customer"); val o = load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    }),

    // -- anti join: customers with no orders in 1998
    "q_join_anti" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1998)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // -- left outer join + agg: order count per customer, zeros included
    "q_join_outer" -> ((s, dir) => {
      val c = load(s, dir, "customer"); val o = load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    // -- explicit cross join (bounded: 5 regions x 25 nations)
    "q_join_cross" -> ((s, dir) => {
      val r = load(s, dir, "region").select(col("r_name"))
      val n = load(s, dir, "nation").select(col("n_name"))
      r.crossJoin(n)
        .groupBy(col("r_name")).agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("r_name"))
    }),

    // -- histogram bucketing (portable floor-division form)
    "q_histogram" -> ((s, dir) =>
      load(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 50000).cast("long")
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
             round(min(col("o_totalprice")), 2).as("lo"),
             round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("bucket"))),

    // -- theta join: equi key + range residual (ship lag > 60 days)
    "q_join_range" -> ((s, dir) => {
      val o = load(s, dir, "orders"); val l = load(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
                l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_late_lines"))
        .orderBy(col("o_orderstatus"))
    }),

    // -- as-of join: each click enriched with the user's most recent
    //    purchase value at-or-before the click (point-in-time semantics)
    "q_asof_join" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))   // unique per (key, ts)
        .agg(max_by(col("value"), col("event_id")).as("pval"))
      graft.operators.AsOfJoin.asOf(
          clicks, purchases, key = "user_id",
          leftTs = "ts", rightTs = "ts", payload = Seq("pval"))
        .select(col("event_id"), col("user_id"), col("pval"))
        .orderBy(col("event_id"))
    }),

    // -- window: top-3 orders per customer (ranking, deterministic ties)
    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      load(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
                col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rk"))
    }),

    // -- window: cumulative sum per user over event time
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      load(s, dir, "events")
        .withColumn("running_value", round(sum(col("value")).over(w), 4))
        .select(col("event_id"), col("user_id"), col("running_value"))
        .orderBy(col("event_id"))
    }),

    // -- window: lag/lead analytic
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
                lag(col("value"), 1).over(w).as("prev_value"),
                lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy(col("event_id"))
    }),

    // -- window: sliding row frame (moving average of 3)
    "q_window_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      load(s, dir, "events")
        .select(col("event_id"),
                round(avg(col("value")).over(w), 4).as("moving_avg"))
        .orderBy(col("event_id"))
    }),

    // -- window: full ranking family over one frame
    "q_window_ranks" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
                rank().over(w).as("rnk"),
                dense_rank().over(w).as("drnk"),
                ntile(4).over(w).as("quartile"),
                round(percent_rank().over(w), 6).as("prank"))
        .filter(col("rnk") <= 20)
        .orderBy(col("o_orderstatus"), col("rnk"), col("o_orderkey"))
    }),

    // -- multiset difference (duplicates preserved)
    "q_set_except_all" -> ((s, dir) => {
      val l = load(s, dir, "lineitem")
      val a = l.filter(col("l_quantity") > 10).select(col("l_orderkey"))
      val b = l.filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      a.exceptAll(b)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_orderkey"))
    }),

    // -- sketch aggregation, HYBRID oracle: the HLL++ estimates are
    //    engine-specific so they cannot hash-match DuckDB, but the exact
    //    distincts CAN — and the estimates enter the gate as a BOUND
    //    (within 10% = 2× the default 5% rsd, emitted as a boolean the
    //    oracle pins to TRUE). Tighter per-run accuracy asserted in specs.
    "q_agg_approx" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
             countDistinct(col("l_partkey")).as("n_parts"),
             approx_count_distinct(col("l_orderkey")).as("a_o"),
             approx_count_distinct(col("l_partkey")).as("a_p"))
        .select(col("l_returnflag"), col("n_orders"), col("n_parts"),
                (abs(col("a_o") - col("n_orders")) <= col("n_orders") * 0.1)
                  .as("orders_within_10pct"),
                (abs(col("a_p") - col("n_parts")) <= col("n_parts") * 0.1)
                  .as("parts_within_10pct"))
        .orderBy(col("l_returnflag"))),

    // -- map-typed columns (keys joined to a string: the driver's pandas
    //    compare can't hash array cells; DuckDB MAP mirrors the semantics)
    "q_map_funcs" -> ((s, dir) =>
      load(s, dir, "orders")
        .select(col("o_orderkey"),
                map_from_arrays(
                  array(lit("status"), lit("priority")),
                  array(col("o_orderstatus"), col("o_orderpriority")))
                  .as("m"))
        .select(col("o_orderkey"),
                array_join(map_keys(col("m")), ",").as("ks"),
                element_at(col("m"), "status").as("status"),
                size(map_values(col("m"))).as("n_vals"))
        .orderBy(col("o_orderkey"))),

    // -- cumulative distribution + null-safe equality
    "q_window_cumedist" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"))
      load(s, dir, "orders")
        .select(col("o_orderkey"),
                round(cume_dist().over(w), 6).as("cd"),
                // null-safe equality over synthesized NULLs: two different
                // nullif sides (never both null; false when either is) —
                // a trivially-true self-comparison would both demo nothing
                // and trip the analyzer's trivially-true-predicate WARN
                (nullif(col("o_orderpriority"), lit("5-LOW")) <=>
                 nullif(col("o_orderpriority"), lit("3-MEDIUM")))
                  .as("mixed_nse"),
                (nullif(col("o_orderpriority"), lit("5-LOW")) <=>
                 lit("1-URGENT")).as("urgent_nse"))
        .orderBy(col("o_orderkey"))
    }),

    // -- global sort + limit (Spark runs TakeOrderedAndProject: no full sort)
    "q_sort_limit" -> ((s, dir) =>
      load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // -- set ops over derived key sets
    "q_set_intersect" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val y97 = o.filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey"))
      val y98 = o.filter(year(col("o_orderdate")) === 1998)
        .select(col("o_custkey"))
      y97.intersect(y98).orderBy(col("o_custkey"))
    }),

    "q_set_except" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val y97 = o.filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey"))
      val y98 = o.filter(year(col("o_orderdate")) === 1998)
        .select(col("o_custkey"))
      y97.except(y98).orderBy(col("o_custkey"))
    }),

    "q_set_union" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val hi = c.filter(col("c_acctbal") > 9000).select(col("c_custkey"))
      val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"))
      hi.union(auto).distinct().orderBy(col("c_custkey"))
    }))

  val oracle: Map[String, String] = Map(
    "q_agg_approx" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  TRUE AS orders_within_10pct,
        |  TRUE AS parts_within_10pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_map_funcs" ->
      """SELECT o_orderkey,
        |  array_to_string(map_keys(map(['status','priority'],
        |    [o_orderstatus, o_orderpriority])), ',') AS ks,
        |  map(['status','priority'],
        |    [o_orderstatus, o_orderpriority])['status'][1] AS status,
        |  CAST(len(map_values(map(['status','priority'],
        |    [o_orderstatus, o_orderpriority]))) AS INT) AS n_vals
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name,
        |  coalesce(n_name, 'ALL') AS n_name,
        |  count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name, n_name""".stripMargin,
    "q_agg_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS seg,
        |  coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nk,
        |  count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY seg, nk""".stripMargin,
    "q_window_range_frame" ->
      """SELECT o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice
        |    RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW), 2) AS rsum
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_agg_salted" ->
      """SELECT l_returnflag,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(25,10))), 2) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,10))), 2) AS DOUBLE)
        |    AS sum_price,
        |  count(*) AS n_rows,
        |  max(l_orderkey) AS max_okey
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_bool_agg" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_pos_qty,
        |  bool_or(l_discount > 0.09) AS any_big_disc,
        |  count(*) FILTER (l_tax > 0.05) AS n_tax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_name, count(*) AS n_cust,
        |  round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_multi" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_bucketed" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_mktsegment, count(*) AS n_cust
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1998)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, count(*) AS n_pairs
        |FROM region CROSS JOIN nation
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_join_range" ->
      """SELECT o_orderstatus, count(*) AS n_late_lines
        |FROM orders JOIN lineitem
        |  ON o_orderkey = l_orderkey
        | AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, arg_max(value, event_id) AS pval
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |c AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, p.pval
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_window_running" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |    AS running_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_window_lag" ->
      """SELECT event_id, user_id,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_window_frame" ->
      """SELECT event_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
        |FROM events ORDER BY event_id""".stripMargin,
    "q_window_ranks" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk,
        |  CAST(quartile AS INT) AS quartile, round(prank, 6) AS prank
        |FROM (
        |  SELECT o_orderkey, o_orderstatus,
        |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |    ntile(4) OVER w AS quartile, percent_rank() OVER w AS prank
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderstatus
        |               ORDER BY o_totalprice DESC, o_orderkey)) t
        |WHERE rnk <= 20
        |ORDER BY o_orderstatus, rnk, o_orderkey""".stripMargin,
    "q_set_except_all" ->
      """SELECT l_orderkey, count(*) AS n FROM (
        |  SELECT l_orderkey FROM lineitem WHERE l_quantity > 10
        |  EXCEPT ALL
        |  SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_window_cumedist" ->
      """SELECT o_orderkey,
        |  round(cume_dist() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice), 6) AS cd,
        |  nullif(o_orderpriority, '5-LOW') IS NOT DISTINCT FROM
        |    nullif(o_orderpriority, '3-MEDIUM') AS mixed_nse,
        |  nullif(o_orderpriority, '5-LOW') IS NOT DISTINCT FROM
        |    '1-URGENT' AS urgent_nse
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        |ORDER BY o_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        |ORDER BY o_custkey""".stripMargin,
    "q_set_union" ->
      """SELECT DISTINCT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |  UNION ALL
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        |ORDER BY c_custkey""".stripMargin)
}
