package graft

import org.apache.spark.sql.{Encoders, SparkSession}

/** Manual smoke: drives the driver-contract surface (`SparkEntry.entry`)
  * and the malformed-input policy of the Maxwell parse, end-to-end.
  * Run: sbt "Test/runMain graft.SmokeProbe" */
object SmokeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("== entry ==")
    SparkEntry.entry(spark).show(false)
    println("== probe: malformed Maxwell lines ==")
    val bad = spark.createDataset(Seq(
      """not json at all""",
      """{"type":null}""",
      """{"database":"d","table":"t","type":"insert","ts":1,"data":{"a":1}}"""
    ))(Encoders.STRING)
    val parsed = cdc.Maxwell.parseEnvelope(bad)
    println("surviving rows = " + parsed.count())
    parsed.show(false)
    spark.stop()
  }
}
