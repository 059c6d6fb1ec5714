package graft

import org.apache.spark.sql.SparkSession

/** Manual: the PINNED-WORKING-SET BOUND probe (round-14 verdict item —
  * the official r14 record collapsed when the pinned estate spilled
  * under box-level memory pressure). Builds every shared one-time frame
  * the bench pins (the IVM state families, the dedup corpora and
  * signature frames) at the given SF, then asserts the estate fits a
  * DRIVER-SHAPE heap (8g, the bench's default) with headroom: pinned
  * memory bytes must stay under half of 8g, and nothing may already
  * have spilled to disk on THIS (possibly larger) heap. Exits non-zero
  * with the offending numbers otherwise.
  * Run: sbt "Test/runMain graft.PinnedBoundProbe [sfDir]" */
object PinnedBoundProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the bench's one-time builds, sequentially (wall time is not the
    // subject here; the pinned estate is identical either way)
    Seq(
      "cdc_ann_topk", "cdc_join_view", "cdc_topk_view", "cdc_dedup_groups",
      "cdc_snowflake_view", "cdc_session_view", "cdc_history",
      "cdc_decontam").foreach { q =>
      ops.CdcQueries.queries(q)(spark, sfDir).count()
    }
    ops.PipelineQueries.kmCentroids(spark, sfDir)
    ops.SharedCorpus.docsTok(spark, sfDir).count()
    ops.SharedCorpus.emb(spark, sfDir).count()
    ops.SharedCorpus.minhashSigs(spark, sfDir).count()
    ops.SharedCorpus.simhashSigs(spark, sfDir).count()
    ops.SharedCorpus.embLshBuckets(spark, sfDir).count()
    val storage = spark.sparkContext.getRDDStorageInfo
    val mem = storage.map(_.memSize).sum
    val disk = storage.map(_.diskSize).sum
    val driverShapeHeap = 8L * 1024 * 1024 * 1024
    val bound = driverShapeHeap / 2
    println(f"pinned_bytes=$mem%d (${mem / 1048576.0}%.1f MiB) " +
      f"disk_bytes=$disk%d bound=$bound%d (4096.0 MiB) sf=$sfDir%s")
    // localCheckpoint's MEMORY_AND_DISK level parks a few small blocks
    // on disk even with a cold heap — only MATERIAL spill (≥ 5% of the
    // in-memory estate) indicates the estate is outgrowing memory
    require(disk <= mem / 20,
      s"pinned estate spilled $disk bytes to disk (vs $mem in memory) " +
        "on this heap — the estate is outgrowing memory")
    require(mem <= bound,
      s"pinned estate $mem B exceeds half of the 8g driver-shape heap " +
        s"($bound B) — no headroom under memory pressure")
    println("PINNED BOUND OK")
    spark.stop()
  }
}
