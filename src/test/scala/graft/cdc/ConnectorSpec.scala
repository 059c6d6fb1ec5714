package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Handler-dispatch surface (R13/R15 parity): registration, op routing to
  * callbacks, error policy, row-at-a-time adapter. */
class ConnectorSpec extends SparkSpec {

  class Capture extends CdcHandler {
    @volatile var creates = 0L
    @volatile var updates = 0L
    @volatile var deletes = 0L
    @volatile var updateBeforeNonNull = 0L
    override def onCreate(after: DataFrame): Unit = creates += after.count()
    override def onUpdate(ba: DataFrame): Unit = {
      updates += ba.count()
      updateBeforeNonNull +=
        ba.filter(col("before.o_totalprice").isNotNull).count()
    }
    override def onDelete(image: DataFrame): Unit = deletes += image.count()
  }

  test("batch replay dispatches ops to the right callbacks") {
    val h = new Capture
    val conn = new Connector(spark)
      .register(ChangelogGen.ordersSpec, h)
    conn.replayBatch(ChangelogGen.ordersEnvelope(spark, sfDir))
    val orders = graft.Tables.load(spark, sfDir, "orders")
    assert(h.creates == orders.count())
    assert(h.updates == orders.filter(col("o_orderstatus") === "F").count())
    assert(h.deletes == orders.filter(col("o_orderkey") % 10 === 0).count())
    assert(h.updateBeforeNonNull == h.updates) // `old` carries changed col
  }

  test("streaming file source drives the same callbacks") {
    val h = new Capture
    val conn = new Connector(spark).register(ChangelogGen.ordersSpec, h)
    val logDir = java.nio.file.Files.createTempDirectory("connlog").toString
    val ckpt = java.nio.file.Files.createTempDirectory("connckpt").toString
    ChangelogGen.ordersChangelog(spark, sfDir).select("value")
      .coalesce(1).write.mode("overwrite").text(logDir)
    conn.startFileStream(logDir, ckpt).awaitTermination()
    val orders = graft.Tables.load(spark, sfDir, "orders")
    assert(h.creates == orders.count())
    assert(h.deletes == orders.filter(col("o_orderkey") % 10 === 0).count())
  }

  test("handler errors are logged, not propagated (offsets still advance)") {
    val boom = new CdcHandler {
      override def onCreate(after: DataFrame): Unit =
        throw new RuntimeException("handler boom")
    }
    val h = new Capture
    val conn = new Connector(spark)
      .register(ChangelogGen.ordersSpec, boom, h)
    conn.replayBatch(ChangelogGen.ordersEnvelope(spark, sfDir))
    // the failing handler did not prevent the next handler from running
    assert(h.creates > 0)
  }

  test("row-at-a-time adapter sees before/after pairs") {
    var seen = List.empty[(Long, Double, Double)]
    val rowH = new RowCdcHandler {
      override def updateRow(before: Row, after: Row): Unit =
        seen ::= ((after.getAs[Long]("o_orderkey"),
                   before.getAs[Double]("o_totalprice"),
                   after.getAs[Double]("o_totalprice")))
    }
    val conn = new Connector(spark).register(ChangelogGen.ordersSpec, rowH)
    val firstF = graft.Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F").limit(1)
      .select("o_orderkey", "o_totalprice").head()
    conn.replayBatch(ChangelogGen.ordersEnvelope(spark, sfDir))
    val k = firstF.getLong(0)
    val found = seen.find(_._1 == k).get
    assert(found._2 == firstF.getDouble(1))          // old price
    assert(found._3 == firstF.getDouble(1) * 1.1)    // new price
  }

  test("duplicate registration rejected; topic naming matches reference") {
    val conn = new Connector(spark, serverName = "tidb0")
      .register(ChangelogGen.ordersSpec)
    intercept[IllegalArgumentException] {
      conn.register(ChangelogGen.ordersSpec)
    }
    assert(conn.topics == Seq("tidb0.graft_demo.orders"))
  }
}
