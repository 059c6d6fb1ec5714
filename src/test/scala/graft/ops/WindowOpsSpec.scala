package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gap-based sessionization: boundary semantics against a hand-built
  * event log (a 30-min gap continues the session, >30 min breaks it). */
class WindowOpsSpec extends SparkSpec {

  test("event funnel: ordered steps, monotone non-increasing stage counts") {
    import spark.implicits._
    val t0 = 1700000000L
    // user 1 completes the funnel in order; user 2 clicks BEFORE viewing
    // (click must not count); user 3 views only
    val ev = Seq(
      (1L, "view", t0), (1L, "click", t0 + 10), (1L, "purchase", t0 + 20),
      (2L, "click", t0), (2L, "view", t0 + 10),
      (3L, "view", t0)
    ).toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
              timestamp_micros(col("us") * 1000000L).as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = FunctionQueries.queries("q_event_funnel")(spark, dir)
      .collect().sortBy(_.getAs[Int]("stage"))
    assert(out.map(_.getAs[Long]("n_users")).toSeq == Seq(3L, 1L, 1L))
  }

  test("sessionize splits on >30min gaps, per user") {
    import spark.implicits._
    // user 1: events at t0, +10min, +40min (gap 30min exactly -> SAME
    // session: the break needs strictly more), +40min+31min (breaks)
    // user 2: single event
    val t0 = 1700000000L
    val events = Seq(
      (1L, t0),
      (2L, t0 + 600),
      (3L, t0 + 600 + 1800),
      (4L, t0 + 600 + 1800 + 1860),
      (5L, t0)
    ).map { case (id, ts) => (id, new java.sql.Timestamp(ts * 1000),
        if (id == 5L) 2L else 1L, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val outDir = java.nio.file.Files.createTempDirectory("sess").toString
    events.write.mode("overwrite").parquet(s"$outDir/events.parquet")
    val out = FunctionQueries.queries("q_sessionize")(spark, outDir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("sess_id"),
                 r.getAs[Long]("n_events")))
      .toSet
    assert(out == Set((1L, 1, 3L), (1L, 2, 1L), (2L, 1, 1L)))
  }
}
