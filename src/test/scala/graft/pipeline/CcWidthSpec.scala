package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.PipelineQueries
import graft.dedup.Dedup

/** The connected-components loop width must SCALE with the family graph
  * (round-13 verdict: the fixed 8-partition loop was the last named
  * scale-killer). Three probes: the width formula itself, the CC rounds
  * actually running wider on a 10× family-shaped graph, and the
  * family clustering being built once (memoized) for its two consumers.
  */
class CcWidthSpec extends SparkSpec {

  test("ccWidth: floor 8 on tiny graphs, grows with nodes, session cap") {
    val wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "64")
    // sf0.1-sized family graph (~1.5k nodes) keeps the historical 8
    assert(PipelineQueries.ccWidth(1500L, wide) === 8)
    // 10x family graph widens past the floor
    assert(PipelineQueries.ccWidth(15000L, wide) === 15)
    // 100x clamps at the session width — the deployment's parallelism
    assert(PipelineQueries.ccWidth(150000L, wide) === 64)
    // a 4-wide test session never drops below the floor
    assert(PipelineQueries.ccWidth(150000L, spark) === 8)
    assert(PipelineQueries.ccWidth(0L, wide) === 8)
  }

  /** Family-shaped chain graph: per base id, variants +1e6 and +2e6
    * edge-linked 0-1 and 1-2 (the q_dedup_clusters topology). */
  private def familyEdges(nFamilies: Long) = {
    val base = spark.range(nFamilies).select((col("id") * 10).as("src"))
    base.select(col("src"), (col("src") + 1000000L).as("dst"))
      .unionByName(base.select((col("src") + 1000000L).as("src"),
                               (col("src") + 2000000L).as("dst")))
  }

  test("CC rounds run at the derived width and widen on a 10x graph") {
    val wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "64")

    def maxTasksDuring(work: => Unit): Int = {
      val maxTasks = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted)
            : Unit =
          maxTasks.getAndUpdate(m => math.max(m, s.stageInfo.numTasks))
      }
      spark.sparkContext.addSparkListener(listener)
      try { work; Thread.sleep(200) }
      finally spark.sparkContext.removeSparkListener(listener)
      maxTasks.get
    }

    def run(nFamilies: Long): (Int, Int, Long) = {
      val w = PipelineQueries.ccWidth(nFamilies * 3, wide)
      var parts = 0
      val tasks = maxTasksDuring {
        // localEdgeCap = 0: this case pins the DISTRIBUTED loop's width
        // discipline, so the driver-local fast path (which has no loop
        // and no width — LocalCcSpec owns its contract) is bypassed
        val labels = Dedup.connectedComponents(familyEdges(nFamilies),
          "src", "dst", shufflePartitions = w, localEdgeCap = 0)
        parts = labels.rdd.getNumPartitions
        // every family collapses to one component labeled by min
        val nComp = labels.select(countDistinct(col("component")))
          .collect()(0).getLong(0)
        assert(nComp === nFamilies)
      }
      (w, tasks, parts.toLong)
    }

    val (w1, _, parts1) = run(500L)     // sf0.1-sized: 1500 nodes
    val (w10, tasks10, parts10) = run(5000L) // 10x: 15000 nodes
    assert(w1 === 8)
    assert(w10 === 15)
    // the loop's group-by stages really ran at the wider width
    assert(parts1 === w1.toLong)
    assert(parts10 === w10.toLong)
    assert(tasks10 >= w10)
  }

  test("familyComponents is memoized: both consumers share one build") {
    val a = PipelineQueries.familyComponents(spark, sfDir)
    val b = PipelineQueries.familyComponents(spark, sfDir)
    assert(a eq b)
    // and the shared frame still serves both query shapes
    val clusters = graft.ops.PipelineQueries
      .queries("q_dedup_clusters")(spark, sfDir)
    val splits = graft.ops.PipelineQueries
      .queries("q_split_cluster_safe")(spark, sfDir)
    assert(clusters.count() > 0)
    assert(splits.select(sum(col("n_docs"))).collect()(0).getLong(0) ===
      clusters.count())
  }
}
