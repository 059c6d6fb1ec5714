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
    // manual replay mirroring the CURRENT applyBatch, per-step timers
    locally {
      import cdc._
      import org.apache.spark.sql.DataFrame
      val child = spark.newSession()
      child.conf.set("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_PROBE_AQE", "false"))
      sys.env.get("GRAFT_PROBE_PARTS").foreach(p =>
        child.conf.set("spark.sql.shuffle.partitions", p))
      def inChild(df: DataFrame): DataFrame =
        org.apache.spark.sql.graft.bridge.reRoot(df, child)
      def emptyLike(df: DataFrame): DataFrame =
        child.createDataFrame(sc.emptyRDD[org.apache.spark.sql.Row], df.schema)
      val lSchema = emptyLike(Materializer.compact(le.limit(0), Seq("o_orderkey")))
      val rSchema = emptyLike(Materializer.compact(re.limit(0), Seq("c_custkey")))
      val emptyView = emptyLike(
        lSchema.drop(Materializer.MetaCols: _*)
          .join(rSchema.drop(Materializer.MetaCols: _*),
                col("o_custkey") === col("c_custkey"))
          .select(viewCols.map(col): _*))
      val lPinned = t("pin lEvents")(inChild(le.localCheckpoint()))
      val rPinned = t("pin rEvents")(inChild(re.localCheckpoint()))
      val windows = (Long.MinValue +: cuts) :+ Long.MaxValue
      var st = JoinView.State(lSchema, rSchema, emptyView)
      var bi = 0
      windows.sliding(2).foreach { case Seq(lo, hi) =>
        bi += 1
        val dl = lPinned.filter(col("ts") > lo && col("ts") <= hi)
        val dr = rPinned.filter(col("ts") > lo && col("ts") <= hi)
        def localKeys(delta: DataFrame, k: String): DataFrame = {
          val sel = delta.select(col(s"after.$k").as(k))
          val rows = sel.collect().distinct.toSeq
          delta.sparkSession.createDataFrame(
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, sel.schema)
        }
        val changedL = t(s"b$bi keysL")(localKeys(dl, "o_orderkey"))
        val changedR = t(s"b$bi keysR")(localKeys(dr, "c_custkey"))
        val lNext = t(s"b$bi lNext")(
          Materializer.merge(st.left, dl, Seq("o_orderkey"),
            changedKeys = Some(changedL)).localCheckpoint())
        val rNext = t(s"b$bi rNext")(
          Materializer.merge(st.right, dr, Seq("c_custkey"),
            changedKeys = Some(changedR)).localCheckpoint())
        val keep = st.view
          .join(broadcast(changedL), Seq("o_orderkey"), "left_anti")
          .join(broadcast(changedR.withColumnRenamed("c_custkey", "o_custkey")),
                Seq("o_custkey"), "left_anti")
        val liveL = Materializer.liveView(lNext)
        val liveR = Materializer.liveView(rNext)
        val rebuiltL = broadcast(
            liveL.join(broadcast(changedL), Seq("o_orderkey"), "left_semi"))
          .join(liveR, col("o_custkey") === col("c_custkey"))
        val rebuiltR = liveL.join(broadcast(changedL), Seq("o_orderkey"), "left_anti")
          .join(broadcast(
              liveR.join(broadcast(changedR), Seq("c_custkey"), "left_semi")),
                col("o_custkey") === col("c_custkey"))
        val viewNext = t(s"b$bi viewNext (lazy build)")(keep
          .select(viewCols.map(col): _*)
          .unionByName(rebuiltL.select(viewCols.map(col): _*))
          .unionByName(rebuiltR.select(viewCols.map(col): _*)))
        st = JoinView.State(lNext, rNext, viewNext)
      }
      t("final count")(st.view.count())
      t("final count x2")(st.view.count())
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
