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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.count() // materializes without throwing; some queries are
                 // legitimately empty at this sf (e.g. threshold filters)
    }
  }
}
