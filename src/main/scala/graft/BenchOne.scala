package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time a subset of SparkEntry.queries by name (all the same
  * session settings as Bench). `runMain graft.BenchOne q_a q_b ...` */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => }
    }
    try { cdc.ChangelogGen.ordersChangelog(spark, sfDir).count() }
    catch { case _: Throwable => }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val rows = try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getMessage.take(200)}"); -1L }
      println(f"$n%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$rows")
    }
    spark.stop()
  }
}
