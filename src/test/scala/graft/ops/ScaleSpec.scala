package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-design mechanisms: salted aggregation/join equivalence and
  * bucketed (shuffle-free) joins. */
class ScaleSpec extends SparkSpec {

  test("hive-partitioned layout prunes at planning time (PartitionFilters)") {
    // the 100 TB data-layout story: a corpus written partitionBy(lang)
    // answers per-language queries by LISTING only matching directories
    // — the filter must land in the scan's PartitionFilters, leaving no
    // post-scan Filter on lang and reading rows of ONE language only
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter must prune partitions:\n$scan")
    assert(q.count() == docs.filter(col("lang") === "en").count())
  }

  test("saltedAgg equals direct groupBy (sum/count/min/max)") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("q"),
           count(col("l_orderkey")).as("n"),
           min(col("l_extendedprice")).as("mn"),
           max(col("l_extendedprice")).as("mx"))
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), saltBuckets = 8,
      Map("q" -> (col("l_quantity"), "sum"),
          "n" -> (col("l_orderkey"), "count"),
          "mn" -> (col("l_extendedprice"), "min"),
          "mx" -> (col("l_extendedprice"), "max")))
    val cols = Seq("l_returnflag", "n", "mn", "mx")
    // float sums: compare rounded (partial-order differs by design)
    val d2 = direct.select(col("l_returnflag"), round(col("q"), 2).as("q"),
      col("n"), col("mn"), col("mx"))
    val s2 = salted.select(col("l_returnflag"), round(col("q"), 2).as("q"),
      col("n"), col("mn"), col("mx"))
    assert(d2.exceptAll(s2).count() == 0 && s2.exceptAll(d2).count() == 0)
  }

  test("saltedJoin equals plain join") {
    val o = graft.Tables.load(spark, sfDir, "orders")
    val c = graft.Tables.load(spark, sfDir, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"))
    val salted = Skew.saltedJoin(o, c, "o_custkey", saltBuckets = 4)
      .select(col("o_orderkey"), col("c_mktsegment"))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("BucketedTables: memoized reuse + rebuild after wiped files") {
    val (bo1, bc1) = BucketedTables.ensure(spark, sfDir)
    // second call is a pure lookup — same tables back
    assert(BucketedTables.ensure(spark, sfDir) == ((bo1, bc1)))
    val n1 = spark.table(bo1).join(spark.table(bc1),
      col("o_custkey") === col("c_custkey")).count()
    assert(n1 > 0)
    // wipe the backing files out from under the catalog: ensure() must
    // detect the dangling entries and rebuild instead of the query failing
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED `$bo1`")
      .filter(col("col_name") === "Location")
      .collect()(0).getString(1).stripPrefix("file:")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(loc).getParentFile)
    val (bo2, bc2) = BucketedTables.ensure(spark, sfDir)
    assert(bo2 != bo1, "wiped layout must be rebuilt under a fresh name")
    val n2 = spark.table(bo2).join(spark.table(bc2),
      col("o_custkey") === col("c_custkey")).count()
    assert(n2 == n1)
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is a static conf — the suite session's default
    // (./spark-warehouse, gitignored) is used; isolate runtime confs only
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    // the in-memory catalog forgets tables between JVM runs but the
    // warehouse directories survive — clear both sides first
    Seq("orders_b", "customer_b").foreach { t =>
      s2.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        s2.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
    val o = graft.Tables.load(s2, sfDir, "orders")
    val c = graft.Tables.load(s2, sfDir, "customer")
    o.write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_b")
    c.write.mode("overwrite").bucketBy(4, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_b")
    val joined = s2.table("orders_b")
      .join(s2.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and it is still correct
    val n = joined.count()
    val expect = graft.Tables.load(s2, sfDir, "orders")
      .join(graft.Tables.load(s2, sfDir, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    assert(n == expect)
  }

  test("pinned-state partitioning survives reRoot: one exchange per CC round") {
    // the label-propagation round shape: edges pinned pre-partitioned on
    // the join key, labels arriving partitioned from the previous
    // round's groupBy — the ONLY exchange left is the min-label
    // re-group. Guards both Dedup.connectedComponents' round cost and
    // bridge.reRootPartitioned's partitioning preservation (plain
    // reRoot deliberately DROPS partitioning at session boundaries —
    // see its scaladoc for the width-mismatch crash that forces the
    // split).
    import org.apache.spark.sql.graft.bridge
    val child = spark.newSession()
    child.conf.set("spark.sql.adaptive.enabled", "false")
    child.conf.set("spark.sql.shuffle.partitions", "4")
    val edges = spark.range(1000)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val sym = bridge.reRootPartitioned(
      edges.repartition(4, col("a")).localCheckpoint(), child)
    val labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("component")).localCheckpoint(false)
    val next = sym.join(labels, col("a") === col("id"))
      .select(col("b").as("id"), col("component"))
      .union(labels).groupBy("id").agg(min("component").as("component"))
    val exchanges = next.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1,
      s"CC round must plan exactly one exchange, got ${exchanges.size}:\n" +
        next.queryExecution.executedPlan)
  }
}
