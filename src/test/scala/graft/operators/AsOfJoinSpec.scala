package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("asOf picks the latest right row at-or-before each left ts") {
    val left = spark.createDataFrame(Seq(
      (1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 20L, "e3"),
      (2L, 7L, "e4"), (3L, 9L, "e5")
    )).toDF("k", "lts", "tag")
    val right = spark.createDataFrame(Seq(
      (1L, 5L, 100.0), (1L, 15L, 200.0),
      (2L, 1L, 300.0), (2L, 8L, 400.0)
    )).toDF("k", "rts", "pval")
    val got = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("pval"))
      .select("tag", "pval").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("e1").contains(100.0)) // inclusive: rts == lts matches
    assert(got("e2").contains(100.0)) // 15 is in the future at ts=10
    assert(got("e3").contains(200.0))
    assert(got("e4").contains(300.0)) // 8 > 7, so the ts=1 row wins
    assert(got("e5").isEmpty)         // key 3 has no state yet -> NULL
  }

  test("asOf NULL keys: left NULL-key rows kept unmatched, right ignored") {
    val left = spark.sql(
      """SELECT * FROM VALUES (CAST(NULL AS BIGINT), 10L, 'ln'),
        |(1L, 10L, 'l1') AS t(k, lts, tag)""".stripMargin)
    val right = spark.sql(
      """SELECT * FROM VALUES (CAST(NULL AS BIGINT), 5L, 100.0D),
        |(1L, 5L, 200.0D) AS t(k, rts, pval)""".stripMargin)
    val got = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("pval"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(got("ln").isEmpty)          // NULL key never matches NULL key
    assert(got("l1").contains(200.0))
  }

  test("asOf keeps every left row and all left columns") {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("pval"))
    val joined = AsOfJoin.asOf(clicks, purchases, "user_id", "ts", "ts",
      Seq("pval"))
    assert(joined.count() == clicks.count())
    assert(joined.columns.toSeq == Seq("event_id", "user_id", "ts", "pval"))
  }
}
