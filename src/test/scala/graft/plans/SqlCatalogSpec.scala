package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL catalog surface over maintained faces: a SQL-first consumer
  * must reach every maintained view through plain `spark.sql(...)` —
  * with a plan that READS the maintained state (pinned frames in
  * session, face files on a persisted root), never a rebuild. The
  * function registry (`vec_dot`, sketches) is covered by
  * PlanRewriteSpec; this is the faces half. */
class SqlCatalogSpec extends SparkSpec {

  test("session faces serve through spark.sql as state reads") {
    val names = Seq("cdc_dedup_index", "cdc_token_freq",
                    "cdc_cluster_stats")
    // force the shared replay builds once (the same one-time cost the
    // named queries pay), then register and read through SQL
    val registered = graft.ops.CdcQueries.registerSqlFaces(
      spark, sfDir, names)
    assert(registered == names)
    names.foreach { n =>
      val viaSql = spark.sql(s"SELECT * FROM $n")
      val direct = graft.ops.CdcQueries.queries(n)(spark, sfDir)
      assert(viaSql.columns.toSeq == direct.columns.toSeq,
        s"$n: SQL surface schema diverged")
      assert(viaSql.collect().toSeq.map(_.toString).sorted ==
               direct.collect().toSeq.map(_.toString).sorted,
        s"$n: SQL surface values diverged from the engine serve")
    }
    // the plan contract: the index face through SQL is STILL a single
    // pinned-frame read — no join, no parquet rescan, no rebuild (the
    // cdc_dedup_index serve discipline, now through the catalog)
    val plan = spark.sql(
      "SELECT id_a, id_b FROM cdc_dedup_index").queryExecution.executedPlan
    assert(!plan.toString.contains("Join"),
      s"SQL face read plans a join:\n$plan")
    val leaves = plan.collectLeaves().map(_.toString)
    assert(leaves.size == 1 && !leaves.head.contains("Scan parquet"),
      s"SQL face read is not a single pinned-frame read:\n" +
        leaves.mkString("\n"))
    // and faces COMPOSE in SQL — a join across two maintained faces
    val joined = spark.sql(
      """SELECT s.cluster_size, s.n_clusters, count(f.token) AS n_tok
        |FROM cdc_cluster_stats s CROSS JOIN cdc_token_freq f
        |GROUP BY s.cluster_size, s.n_clusters""".stripMargin)
    assert(joined.count() > 0, "cross-face SQL must compose")
  }

  test("registerSqlFaces is all-or-nothing on an unknown name") {
    // a typo mid-list must not leave the session partially registered
    // (with the earlier names' replay families already force-built)
    intercept[IllegalArgumentException] {
      graft.ops.CdcQueries.registerSqlFaces(
        spark, sfDir, Seq("cdc_mix_weights", "cdc_nope"))
    }
    assert(!spark.catalog.tableExists("cdc_mix_weights"),
      "a failed registration must register nothing")
  }

  test("persisted faces register as temp views and read the face files") {
    import org.apache.spark.sql.types._
    import graft.cdc.TableSpec
    import graft.streaming.CdcStream
    val logDir = java.nio.file.Files.createTempDirectory("sqlcat").toString
    val root = java.nio.file.Files.createTempDirectory("sqlcatst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sqlcatck").toString
    val spec = TableSpec("d", "t", Seq("id"), StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("v", LongType))))
    def ev(op: String, ts: Long, id: Long, grp: String, v: Long) =
      s"""{"database":"d","table":"t","type":"$op","ts":$ts,"data":{"id":$id,"grp":"$grp","v":$v}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(logDir, "b1.json"),
      (Seq(ev("insert", 1, 1, "a", 10), ev("insert", 2, 2, "a", 20),
           ev("insert", 3, 3, "b", 5), ev("insert", 4, 4, "b", 7),
           ev("delete", 5, 4, "b", 7))
        .mkString("\n") + "\n").getBytes("UTF-8"))
    CdcStream.maintainTableViewsToParquet(
      CdcStream.fileChangelog(spark, logDir), spec,
      Seq(CdcStream.NamedTableView.topK("t_topk", "grp", "v", k = 2),
          CdcStream.NamedTableView.distinctCount("t_dist", "grp", "v"),
          CdcStream.NamedTableView.moments("t_mom", "grp", "v")),
      root, ckpt).awaitTermination()
    CdcStream.registerFaceViews(spark, root,
      Seq("t_topk", "t_dist", "t_mom"))
    // values through SQL == the engine's own face read
    val viaSql = spark.sql(
      "SELECT grp, n_distinct_v FROM t_dist ORDER BY grp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = CdcStream.readMultiView(spark, root, "t_dist").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == direct, s"SQL $viaSql vs direct $direct")
    assert(viaSql == Map("a" -> 2L, "b" -> 1L))
    // faces compose across views in one SQL statement
    val composed = spark.sql(
      """SELECT d.grp, d.n_distinct_v, m.n_rows
        |FROM t_dist d JOIN t_mom m ON d.grp = m.grp
        |ORDER BY d.grp""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(composed.toSeq == Seq(("a", 2L, 2L), ("b", 1L, 1L)))
    // plan contract: the read scans the persisted FACE file of the live
    // generation — never a changelog fold or a state rebuild
    val plan = spark.sql("SELECT * FROM t_topk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("__view"),
      s"persisted face read must scan the generation's __view file:\n$plan")
    assert(!plan.contains("changes"),
      s"persisted face read must not fold the changelog:\n$plan")
  }

  test("serving a SQL-path query leaves no catalog footprint") {
    // a consumer's own temp view sharing a query's name must survive a
    // serve (the serveSql round-trip uses a PRIVATE internal name and
    // drops it; registerSqlFaces is the surface that binds public
    // names deliberately)
    spark.sql("SELECT 1 AS x").createOrReplaceTempView("cdc_ann_drift")
    try {
      graft.ops.CdcQueries.queries("cdc_ann_drift")(spark, sfDir).collect()
      assert(spark.sql("SELECT * FROM cdc_ann_drift").columns.toSeq ==
               Seq("x"),
        "serving must not clobber a consumer's own temp view")
      graft.ops.CdcQueries.queries("cdc_distinct_view")(spark, sfDir)
        .collect()
      assert(!spark.catalog.tableExists(
          "graft_internal_cdc_distinct_view_serve") &&
        !spark.catalog.tableExists("graft_internal_cdc_ann_drift_serve"),
        "the internal serve views must be dropped after the round-trip")
    } finally spark.catalog.dropTempView("cdc_ann_drift")
  }
}
