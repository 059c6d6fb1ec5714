package graft

import org.apache.spark.sql.SparkSession

/** Manual plan inspection: prints formatted physical plans for
  * representative queries so scan pushdown / broadcast / codegen spans can
  * be eyeballed. Run: sbt "Test/runMain graft.PlanProbe [queryName...]" */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter_project", "q_agg_basic", "q_join_multi",
               "q_sim_topk", "cdc_materialize")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .explain("formatted")
    }
    spark.stop()
  }
}
