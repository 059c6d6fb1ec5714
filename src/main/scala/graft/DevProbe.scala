package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro profiler for the cdc_join_view pipeline stages. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    def t[A](name: String)(f: => A): A = {
      sc.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      sc.setJobDescription(null)
      r
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    val stageToDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    sc.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (te.taskMetrics != null) {
            taskNanos.addAndGet(te.taskMetrics.executorRunTime * 1000000L)
            gcMs.addAndGet(te.taskMetrics.jvmGCTime)
            cpuNanos.addAndGet(te.taskMetrics.executorCpuTime)
            deserMs.addAndGet(te.taskMetrics.executorDeserializeTime)
          }
        }
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("?")
          j.stageIds.foreach(sid => stageToDesc.put(sid, desc))
        }
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = s.stageInfo
          val desc = stageToDesc.getOrDefault(si.stageId, "?")
          stages.merge(s"$desc | ${si.name.take(60)} [${si.numTasks}t]",
                       si.taskMetrics.executorRunTime,
                       (a: Long, b: Long) => a + b)
        }
      })
    t("warm: orders log")(cdc.ChangelogGen.ordersChangelog(spark, sfDir).count())
    t("orders envelope")(cdc.ChangelogGen.ordersEnvelope(spark, sfDir).count())
    t("orders events count")(cdc.ChangelogGen.ordersChangeEvents(spark, sfDir).count())
    t("orders events count x2")(cdc.ChangelogGen.ordersChangeEvents(spark, sfDir).count())
    t("customer events count")(cdc.ChangelogGen.customerChangeEvents(spark, sfDir).count())
    val le = cdc.ChangelogGen.ordersChangeEvents(spark, sfDir)
    val re = cdc.ChangelogGen.customerChangeEvents(spark, sfDir)
    val cuts = Seq(788918400L, 852076800L)
    val viewCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
                       "o_totalprice", "c_name", "c_acctbal")
    t("replay (current impl)") {
      cdc.JoinView.replay(le, re, cuts, Seq("o_orderkey"), Seq("c_custkey"),
                          Seq("o_custkey"), viewCols).view.count()
    }
    t("replay x2") {
      cdc.JoinView.replay(le, re, cuts, Seq("o_orderkey"), Seq("c_custkey"),
                          Seq("o_custkey"), viewCols).view.count()
    }
    println(s"jobs=${jobs.get} tasks=${tasks.get} " +
      f"taskTime=${taskNanos.get / 1e9}%.1f s " +
      f"cpu=${cpuNanos.get / 1e9}%.1f s gc=${gcMs.get / 1e3}%.1f s " +
      f"deser=${deserMs.get / 1e3}%.1f s")
    stages.entrySet().forEach { e =>
      if (e.getValue > 1000)
        println(f"  ${e.getKey}%-30s ${e.getValue / 1e3}%.1f s")
    }
    spark.stop()
  }
}
