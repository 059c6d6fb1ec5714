package graft

import org.apache.spark.sql.SparkSession

/** Manual: profile ONE shared-state build (a state_build_breakdown
  * family) stage-by-stage — aggregate task time grouped by the stage's
  * first non-Spark call site, top offenders first. Pinpoints WHERE a
  * family's build time goes (decode, merge, chain step, maintainer
  * probe) without re-instrumenting the replay loops.
  * Run: sbt "Test/runMain graft.StateBuildProbe <query> [sfDir]" */
object StateBuildProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val agg = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          val site = sc.stageInfo.details.linesIterator
            .filterNot(l => l.contains("org.apache.spark.") ||
                            l.contains("java.") || l.contains("scala."))
            .take(2).mkString(" <- ")
          val key = sc.stageInfo.name.takeWhile(_ != ' ') + " @ " + site
          agg.merge(key, (m.executorRunTime, 1L),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    }
    // mirror the bench: the decoded-changelog caches are warm before
    // any state build runs, so the profile shows steady-state cost
    Seq[(String, () => org.apache.spark.sql.DataFrame)](
      ("orders", () => cdc.ChangelogGen.ordersChangeEvents(spark, sfDir)),
      ("customer", () => cdc.ChangelogGen.customerChangeEvents(spark, sfDir)),
      ("lineitem", () => cdc.ChangelogGen.lineitemChangeEvents(spark, sfDir)),
      ("documents", () => cdc.ChangelogGen.documentsChangeEvents(spark, sfDir)),
      ("embeddings", () => cdc.ChangelogGen.embeddingsChangeEvents(spark, sfDir)),
      ("events", () => cdc.ChangelogGen.eventsChangeEvents(spark, sfDir)),
      ("benchmarks", () => cdc.ChangelogGen.benchChangeEvents(spark, sfDir))
    ).foreach { case (nm, f) =>
      val t = System.nanoTime()
      f().count()
      println(f"warm $nm: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    spark.sparkContext.removeSparkListener(listener)
    println(f"== $name: $wall%.1f s wall ($n rows) — task-time by site ==")
    import scala.jdk.CollectionConverters._
    agg.asScala.toSeq.sortBy(-_._2._1).take(25).foreach {
      case (site, (ms, cnt)) =>
        println(f"${ms / 1000.0}%8.1f s  x$cnt%-4d $site")
    }
    // second pass = the bench's SERVE measurement (state warm); profile
    // it separately so build cost can't mask a serve-path regression
    agg.clear()
    spark.sparkContext.addSparkListener(listener)
    val t1 = System.nanoTime()
    val n2 = SparkEntry.queries(name)(spark, sfDir).count()
    val serveWall = (System.nanoTime() - t1) / 1e9
    Thread.sleep(1000)
    spark.sparkContext.removeSparkListener(listener)
    println(f"== $name SERVE: $serveWall%.2f s wall ($n2 rows) — by site ==")
    agg.asScala.toSeq.sortBy(-_._2._1).take(25).foreach {
      case (site, (ms, cnt)) =>
        println(f"${ms / 1000.0}%8.1f s  x$cnt%-4d $site")
    }
    spark.stop()
  }
}
