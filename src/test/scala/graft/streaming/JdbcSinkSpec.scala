package graft.streaming

import graft.SparkSpec
import graft.cdc.ChangelogGen
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CDC -> embedded-Derby JDBC sink E2E (BASELINE.json spark_approach). */
class JdbcSinkSpec extends SparkSpec {

  test("streaming replay materializes into a JDBC table") {
    val dbDir = Files.createTempDirectory("derby").toString
    val url = s"jdbc:derby:$dbDir/graftdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")

    val logDir = Files.createTempDirectory("jdbclog").toString
    val ckpt = Files.createTempDirectory("jdbcckpt").toString
    ChangelogGen.ordersChangelog(spark, sfDir).select("value")
      .coalesce(1).write.mode("overwrite").text(logDir)

    val envelope = CdcStream.fileChangelog(spark, logDir)
      .withColumn("seq", lit(0L))
    CdcStream.materializeToJdbc(envelope, ChangelogGen.ordersSpec,
      url, "orders_state", ckpt, props).awaitTermination()

    val got = graft.cdc.Materializer.liveView(
      spark.read.jdbc(url, "orders_state", props))
    val want = ChangelogGen.ordersState(spark, sfDir)
    assert(got.count() == want.count())
    // Derby TIMESTAMP round-trips at micros; compare on a stable subset
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    assert(got.select(cols.map(col): _*)
      .exceptAll(want.select(cols.map(col): _*)).count() == 0)
  }
}
