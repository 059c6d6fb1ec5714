package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.functions.VectorFunctions

/** Scalar-function inventory (SURVEY.md §2.2): string, date, math, JSON,
  * array (higher-order), conditional — all `org.apache.spark.sql.functions`
  * built-ins (codegen'd), each checked against the DuckDB dialect
  * equivalent. Per-row computations stay exact; only cross-row float
  * aggregates are rounded.
  */
object FunctionQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the EXTENSION LAYER end-to-end in the correctness gate: graft's
    // SQL function registry (GraftFunctions via bridge.installGraft —
    // the same table GraftExtensions injects at builder time) serves a
    // plain spark.sql query using the codegen'd VecDot Catalyst
    // expression, oracle-checked against DuckDB's list_dot_product.
    "q_sql_vecdot" -> ((s, dir) => {
      org.apache.spark.sql.graft.bridge.installGraft(s)
      load(s, dir, "embeddings").createOrReplaceTempView("emb_sql")
      s.sql("""SELECT e1.vec_id,
              |  round(vec_dot(e1.embedding, e1.embedding), 6) AS norm_sq,
              |  round(vec_dot(e1.embedding, e2.embedding), 6) AS dot_next
              |FROM emb_sql e1 JOIN emb_sql e2 ON e2.vec_id = e1.vec_id + 1
              |WHERE e1.vec_id < 50 ORDER BY e1.vec_id""".stripMargin)
    }),

    "q_str_funcs" -> ((s, dir) =>
      load(s, dir, "part")
        .select(col("p_partkey"),
                upper(col("p_name")).as("up_name"),
                length(col("p_name")).as("name_len"),
                substring(col("p_name"), 1, 8).as("name_prefix"),
                concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
                regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
                reverse(col("p_brand")).as("rev_brand"),
                lpad(col("p_brand"), 12, "*").as("pad_brand"),
                replace(col("p_type"), lit(" "), lit("_")).as("type_us"))
        .orderBy(col("p_partkey"))),

    "q_date_funcs" -> ((s, dir) =>
      load(s, dir, "orders")
        .select(col("o_orderkey"),
                year(col("o_orderdate")).as("yr"),
                month(col("o_orderdate")).as("mo"),
                dayofmonth(col("o_orderdate")).as("dom"),
                date_trunc("month", col("o_orderdate")).as("month_start"),
                datediff(col("o_orderdate"),
                         lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy(col("o_orderkey"))),

    "q_math_funcs" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
                abs(col("l_discount") - 0.05).as("disc_dev"),
                floor(col("l_extendedprice")).as("price_floor"),
                ceil(col("l_extendedprice")).as("price_ceil"),
                sqrt(col("l_quantity")).as("qty_sqrt"),
                (col("l_orderkey") % 7).as("key_mod"),
                greatest(col("l_tax"), col("l_discount")).as("max_rate"),
                least(col("l_tax"), col("l_discount")).as("min_rate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q_json_funcs" -> ((s, dir) =>
      load(s, dir, "events")
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast("int").as("k_val"),
                get_json_object(col("props"), "$.missing").as("missing_val"))
        .orderBy(col("event_id"))),

    "q_array_funcs" -> ((s, dir) =>
      load(s, dir, "embeddings")
        .select(col("vec_id"),
                size(col("embedding")).as("dim"),
                element_at(col("embedding"), 1).as("first_val"),
                round(VectorFunctions.dot(col("embedding"), col("embedding")), 6)
                  .as("sq_norm"),
                round(aggregate(VectorFunctions.asDouble(col("embedding")),
                        lit(0.0), (acc, x) => acc + x), 6).as("vec_sum"),
                round(array_max(col("embedding")).cast("double"), 6)
                  .as("max_val"))
        .orderBy(col("vec_id"))),

    "q_case_null" -> ((s, dir) =>
      load(s, dir, "customer")
        .select(col("c_custkey"),
                when(col("c_acctbal") < 0, "negative")
                  .when(col("c_acctbal") < 5000, "low")
                  .otherwise("high").as("bal_bucket"),
                coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")),
                         lit("OTHER")).as("seg_or_other"),
                (col("c_acctbal") > 0).as("in_credit"))
        .orderBy(col("c_custkey"))),

    // more string functions: split_part/translate/repeat/instr/contains
    "q_str_funcs2" -> ((s, dir) =>
      load(s, dir, "part")
        .select(col("p_partkey"),
                split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
                translate(col("p_brand"), "#", "_").as("brand_us"),
                repeat(lit("ab"), 3).as("rep"),
                instr(col("p_name"), "a").as("a_pos"),
                col("p_name").contains("red").as("has_red"))
        .orderBy(col("p_partkey"))),

    // transcendental math (rounded: libm implementations differ in the
    // last ulps across engines)
    "q_math_funcs2" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
                round(log(col("l_extendedprice")), 8).as("ln_price"),
                round(log10(col("l_extendedprice")), 8).as("log10_price"),
                round(exp(col("l_discount")), 8).as("exp_disc"),
                round(pow(col("l_quantity"), 1.5), 6).as("qty_pow"),
                signum(col("l_discount") - 0.05).cast("int").as("disc_sign"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // array higher-order functions + sort/position
    "q_array_funcs2" -> ((s, dir) => {
      import graft.functions.VectorFunctions.asDouble
      load(s, dir, "embeddings")
        .select(col("vec_id"),
                round(aggregate(transform(asDouble(col("embedding")),
                        x => x * 2), lit(0.0), (a, x) => a + x), 6)
                  .as("doubled_sum"),
                size(filter(col("embedding"), x => x > 0)).as("n_pos"),
                element_at(array_sort(asDouble(col("embedding"))), 1)
                  .as("mn"),
                array_position(col("embedding"), array_max(col("embedding")))
                  .cast("int").as("argmax1"))
        .orderBy(col("vec_id"))
    }),

    // edit-distance scalar (fuzzy matching primitive)
    "q_str_distance" -> ((s, dir) =>
      load(s, dir, "part")
        .select(col("p_partkey"),
                levenshtein(col("p_brand"), col("p_type")).as("dist"),
                levenshtein(col("p_name"),
                            reverse(col("p_name"))).as("self_rev_dist"))
        .orderBy(col("p_partkey"))),

    // more date functions: quarter / last_day / ISO week
    "q_date_funcs2" -> ((s, dir) =>
      load(s, dir, "orders")
        .select(col("o_orderkey"),
                quarter(col("o_orderdate")).as("q"),
                last_day(col("o_orderdate")).as("month_end"),
                weekofyear(col("o_orderdate")).as("iso_week"))
        .orderBy(col("o_orderkey"))),

    // window value functions: first/last/nth over ordered frames
    "q_window_firstlast" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      load(s, dir, "events")
        .select(col("event_id"),
                first(col("value")).over(w).as("fv"),
                last(col("value")).over(wFull).as("lv"),
                nth_value(col("value"), 3).over(w).as("nv"))
        .orderBy(col("event_id"))
    }),

    // pivot: rows -> columns (one shuffle; values list pinned so the plan
    // needs no extra distinct-values job)
    "q_pivot" -> ((s, dir) =>
      load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        // empty combos: Spark pivot yields NULL, count(*) FILTER yields 0
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy(col("o_orderpriority"))),

    // exact interpolating percentiles
    "q_percentile" -> ((s, dir) =>
      load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 2).as("med"),
             round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))
        .orderBy(col("o_orderstatus"))),

    // statistical aggregates
    "q_stats_agg" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("c"),
             round(stddev_samp(col("l_quantity")), 6).as("sd"),
             round(var_samp(col("l_discount")), 6).as("v"))
        .orderBy(col("l_returnflag"))),

    // ordered collect (sort_array makes collect_list deterministic; joined
    // to a string because the driver's pandas compare can't hash arrays)
    "q_collect_list" -> ((s, dir) =>
      load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(array_join(
               transform(
                 slice(sort_array(collect_list(col("o_custkey"))), 1, 5),
                 x => x.cast("string")),
               ",").as("ks"))
        .orderBy(col("o_orderstatus"))),

    // generator / UDTF shape: explode tokens into rows
    "q_explode_tokens" -> ((s, dir) =>
      load(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
                explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
        .orderBy(col("doc_id"), col("tok"))),

    // typed UDAF surface: exact top-k Aggregator (buffer holds ≤k pairs,
    // map-side partial agg — the shuffle carries O(k·partitions), vs the
    // window form's full partition sort). Same answer as row_number()<=k.
    "q_udaf_topk" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAggregator(3),
        org.apache.spark.sql.Encoders.product[(Double, Long)])
      load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("ids"))
        .select(col("o_orderstatus"), posexplode(col("ids")))
        .select(col("o_orderstatus"), (col("pos") + 1).cast("int").as("rk"),
                col("col").as("o_orderkey"))
        .orderBy(col("o_orderstatus"), col("rk"))
    }),

    // sequential funnel (product-analytics staple): users who viewed,
    // then clicked AFTER the view, then purchased AFTER the click —
    // strictly ordered steps, not mere co-occurrence. Each step is one
    // aggregate + one equi-join, ALL keyed on user_id: the shuffle key
    // never changes, so the per-user partitioning is planned once and
    // reused across the whole chain; step timestamps compare in exact
    // integer microseconds.
    "q_event_funnel" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
                unix_micros(col("ts")).as("us"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
        .filter(col("us") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
        .filter(col("us") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      def c(stage: Int, step: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(stage).as("stage"), lit(step).as("step"),
                  col("n_users"))
      c(1, "view", t1).unionByName(c(2, "click", t2))
        .unionByName(c(3, "purchase", t3))
        .orderBy(col("stage"))
    }),

    // weekly cohort retention (the funnel's longitudinal sibling): cohort
    // = ISO week of a user's FIRST event; cell (cohort, k) counts users
    // active k weeks later. Scale shape: first-seen is one user-keyed
    // aggregate; the events join is co-partitioned on the same key; the
    // cell aggregate's count_distinct shuffles (cohort, k, user) with
    // map-side partials — all shuffles bounded by |users| and |cells|.
    "q_event_retention" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("user_id"),
                date_trunc("week", col("ts")).cast("date").as("wk"))
      val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      ev.join(first, "user_id")
        .select(col("user_id"), col("cohort"),
                floor(datediff(col("wk"), col("cohort")) / 7)
                  .cast("int").as("k"))
        .filter(col("k") <= 3)
        .groupBy(col("cohort"), col("k"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort"), col("k"))
    }),

    // tumbling event-time window (batch form of the streaming agg)
    "q_time_window" -> ((s, dir) =>
      load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             round(sum(col("value")), 4).as("sum_value"))
        .select(col("window.start").as("ws"), col("event_type"),
                col("n"), col("sum_value"))
        .orderBy(col("ws"), col("event_type"))),

    // sequential-pattern mining: the first-order Markov transition matrix
    // over per-user event sequences — P(next event type | current type),
    // the standard behavioral-model / clickstream summary. One lead()
    // window over (user_id, ts) then a (from, to) rollup; the transition
    // probability reuses the rollup's output in a tiny |types|² window.
    // Scale shape: the event-level work is one shuffle+sort by user (the
    // same partitioning sessionization uses); everything after is
    // |types|²-bounded.
    "q_event_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type").as("from_type"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val wFrom = Window.partitionBy(col("from_type"))
      pairs
        .withColumn("p", round(col("n") /
                               sum(col("n")).over(wFrom), 4))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // time-series anomaly detection: per-type daily event counts scored
    // against their own TRAILING 7-day window (z-score vs the preceding
    // days' mean/stddev — the current day is excluded from its own
    // baseline, the standard self-exclusion that keeps a spike from
    // masking itself). One groupBy (daily rollup, map-side partial) +
    // one window pass sharing a single (event_type, day) shuffle+sort;
    // at 100 TB the daily rollup collapses the input to |days|×|types|
    // rows BEFORE the window, so the sort is over thousands of rows, not
    // billions of events.
    "q_event_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = load(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, -1)
      daily
        .withColumn("mu", avg(col("n")).over(w))
        .withColumn("sd", stddev_samp(col("n")).over(w))
        .withColumn("z", when(col("sd") > 0,
                              (col("n") - col("mu")) / col("sd")))
        .select(col("day"), col("event_type"), col("n"),
                round(col("mu"), 4).as("mu"),
                round(col("sd"), 4).as("sd"),
                round(col("z"), 4).as("z"),
                (abs(col("z")) > 2).as("is_anomaly"))
        .orderBy(col("day"), col("event_type"))
    }),

    // gap-based sessionization (batch form of session_window): a session
    // breaks after >30 min of user inactivity. lag + running sum is the
    // classic two-window formulation; both windows share the same
    // (user_id, ts) partitioning+sort, so Catalyst plans ONE shuffle and
    // ONE sort for the pair. Gap compare in integer microseconds — exact
    // on both engines.
    "q_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gapUs = 1800L * 1000000L
      val newSess = when(
        lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
            > gapUs, 1).otherwise(0)
      load(s, dir, "events")
        .withColumn("sess_id",
          sum(newSess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_id").cast("int").as("sess_id"))
        .agg(count(lit(1)).as("n_events"),
             min(col("ts")).as("sess_start"),
             round((max(unix_micros(col("ts"))) -
                    min(unix_micros(col("ts")))) / 1000000.0, 3)
               .as("dur_sec"))
        .orderBy(col("user_id"), col("sess_id"))
    }))

  val oracle: Map[String, String] = Map(
    "q_sql_vecdot" ->
      """SELECT e1.vec_id,
        |  round(list_dot_product(e1.embedding::DOUBLE[],
        |                         e1.embedding::DOUBLE[]), 6) AS norm_sq,
        |  round(list_dot_product(e1.embedding::DOUBLE[],
        |                         e2.embedding::DOUBLE[]), 6) AS dot_next
        |FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
        |WHERE e1.vec_id < 50 ORDER BY e1.vec_id""".stripMargin,
    "q_str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up_name,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  reverse(p_brand) AS rev_brand,
        |  lpad(p_brand, 12, '*') AS pad_brand,
        |  replace(p_type, ' ', '_') AS type_us
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01',
        |       CAST(o_orderdate AS DATE)) AS INT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  l_orderkey % 7 AS key_mod,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  least(l_tax, l_discount) AS min_rate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS INT) AS k_val,
        |  props->>'$.missing' AS missing_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] AS first_val,
        |  round(list_aggregate(list_transform(embedding::DOUBLE[],
        |        x -> x * x), 'sum'), 6) AS sq_norm,
        |  round(list_aggregate(embedding::DOUBLE[], 'sum'), 6) AS vec_sum,
        |  round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6)
        |    AS max_val
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_case_null" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 5000 THEN 'low'
        |       ELSE 'high' END AS bal_bucket,
        |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER')
        |    AS seg_or_other,
        |  c_acctbal > 0 AS in_credit
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_str_funcs2" ->
      """SELECT p_partkey,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  translate(p_brand, '#', '_') AS brand_us,
        |  repeat('ab', 3) AS rep,
        |  CAST(strpos(p_name, 'a') AS INT) AS a_pos,
        |  contains(p_name, 'red') AS has_red
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_math_funcs2" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(ln(l_extendedprice), 8) AS ln_price,
        |  round(log10(l_extendedprice), 8) AS log10_price,
        |  round(exp(l_discount), 8) AS exp_disc,
        |  round(power(l_quantity, 1.5), 6) AS qty_pow,
        |  CAST(sign(l_discount - 0.05) AS INT) AS disc_sign
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_array_funcs2" ->
      """SELECT vec_id,
        |  round(list_aggregate(list_transform(embedding::DOUBLE[],
        |        x -> x * 2), 'sum'), 6) AS doubled_sum,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  list_sort(embedding::DOUBLE[])[1] AS mn,
        |  CAST(list_position(embedding, list_aggregate(embedding, 'max'))
        |       AS INT) AS argmax1
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_str_distance" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_brand, p_type) AS INT) AS dist,
        |  CAST(levenshtein(p_name, reverse(p_name)) AS INT)
        |    AS self_rev_dist
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs2" ->
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
        |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_firstlast" ->
      """SELECT event_id,
        |  first_value(value) OVER w AS fv,
        |  last_value(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS lv,
        |  nth_value(value, 3) OVER w AS nv
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'F') AS F,
        |  count(*) FILTER (o_orderstatus = 'O') AS O,
        |  count(*) FILTER (o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_percentile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS med,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS c,
        |  round(stddev_samp(l_quantity), 6) AS sd,
        |  round(var_samp(l_discount), 6) AS v
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_collect_list" ->
      """SELECT o_orderstatus,
        |  array_to_string(list(o_custkey ORDER BY o_custkey)[1:5], ',') AS ks
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_explode_tokens" ->
      """SELECT doc_id,
        |  unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
        |    AS tok
        |FROM documents WHERE doc_id < 20
        |ORDER BY doc_id, tok""".stripMargin,
    "q_udaf_topk" ->
      """SELECT o_orderstatus, CAST(rk AS INT) AS rk, o_orderkey FROM (
        |  SELECT o_orderstatus, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_orderstatus, rk""".stripMargin,
    "q_event_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events),
        |first AS (SELECT user_id, min(wk) AS cohort FROM e
        |          GROUP BY user_id)
        |SELECT cohort, CAST(floor(datediff('day', cohort, wk) / 7) AS INT)
        |         AS k,
        |  count(DISTINCT user_id) AS n_active
        |FROM e JOIN first USING (user_id)
        |WHERE floor(datediff('day', cohort, wk) / 7) <= 3
        |GROUP BY 1, 2 ORDER BY cohort, k""".stripMargin,
    "q_event_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |t1 AS (SELECT user_id, min(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
        |SELECT stage, step, n_users FROM (
        |  SELECT 1 AS stage, 'view' AS step, count(*) AS n_users FROM t1
        |  UNION ALL SELECT 2, 'click', count(*) FROM t2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM t3)
        |ORDER BY stage""".stripMargin,
    "q_time_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "q_event_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |pairs AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n / sum(n) OVER (PARTITION BY from_type), 4) AS p
        |FROM pairs ORDER BY from_type, to_type""".stripMargin,
    "q_event_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |scored AS (
        |  SELECT day, event_type, n,
        |    avg(n) OVER w AS mu, stddev_samp(n) OVER w AS sd
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT day, event_type, n, round(mu, 4) AS mu, round(sd, 4) AS sd,
        |  round(CASE WHEN sd > 0 THEN (n - mu) / sd END, 4) AS z,
        |  abs(CASE WHEN sd > 0 THEN (n - mu) / sd END) > 2 AS is_anomaly
        |FROM scored ORDER BY day, event_type""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM e)
        |SELECT user_id, CAST(sess_id AS INT) AS sess_id,
        |  count(*) AS n_events, CAST(min(ts) AS TIMESTAMP) AS sess_start,
        |  round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 3)
        |    AS dur_sec
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin)
}
