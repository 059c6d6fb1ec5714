package graft

import org.apache.spark.sql.functions._

/** Every registered query runs at sf0.001 and yields a sane result; every
  * oracle key has a query. Cheap guard that the driver's Verify pass can
  * never hit an unregistered/broken entry. */
class QueriesSmokeSpec extends SparkSpec {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct lands within 10% of the exact count") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sfDir, "lineitem")
    val both = li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_orderkey")).as("approx"),
      countDistinct(col("l_orderkey")).as("exact"))
    val bad = both.filter(
      abs(col("approx") - col("exact")) > col("exact") * 0.1)
    assert(bad.count() == 0)
  }

  test("map functions produce consistent keys/values") {
    import org.apache.spark.sql.functions._
    val m = SparkEntry.queries("q_map_funcs")(spark, sfDir)
    assert(m.filter(col("ks") =!= "status,priority" ||
                    col("n_vals") =!= 2).count() == 0)
    val joined = m.join(Tables.load(spark, sfDir, "orders"), "o_orderkey")
    assert(joined.filter(col("status") =!= col("o_orderstatus")).count() == 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.count() // materializes without throwing; some queries are
                 // legitimately empty at this sf (e.g. threshold filters)
    }
  }
}
