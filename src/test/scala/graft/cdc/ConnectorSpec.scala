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

  test("multi-table multiplexing: each registration sees only its table") {
    import org.apache.spark.sql.types._
    // second table riding the same envelope stream (R15: one consumer
    // group registry, N tables)
    val userSpec = TableSpec(
      database = "graft_demo", table = "users",
      primaryKey = Seq("id"),
      schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType))))
    val usersJson = spark.createDataFrame(
        Seq((1L, "ada"), (2L, "grace"))).toDF("id", "name")
      .select(to_json(struct(
        lit("graft_demo").as("database"), lit("users").as("table"),
        lit("insert").as("type"), lit(100L).as("ts"),
        struct(col("id"), col("name")).as("data"))).as("value"),
        lit(0L).as("seq"))
    val mixed = ChangelogGen.ordersChangelog(spark, sfDir)
      .unionByName(usersJson)
    val envelope = mixed.select(
        from_json(col("value"), Maxwell.envelopeSchema).as("e"), col("seq"))
      .select(col("e.*"), col("seq"))
    val hOrders = new Capture
    var userNames = Set.empty[String]
    val hUsers = new CdcHandler {
      override def onCreate(after: DataFrame): Unit =
        userNames ++= after.collect().map(_.getAs[String]("name"))
    }
    new Connector(spark)
      .register(ChangelogGen.ordersSpec, hOrders)
      .register(userSpec, hUsers)
      .replayBatch(envelope)
    val orders = graft.Tables.load(spark, sfDir, "orders")
    assert(hOrders.creates == orders.count())   // no cross-table bleed
    assert(userNames == Set("ada", "grace"))
  }

  test("decimal/array/map payload columns decode (reference drops them)") {
    import org.apache.spark.sql.types._
    val richSpec = TableSpec(
      database = "d", table = "rich", primaryKey = Seq("id"),
      schema = StructType(Seq(
        StructField("id", LongType),
        StructField("price", DecimalType(10, 2)),
        StructField("tags", ArrayType(StringType)),
        StructField("attrs", MapType(StringType, LongType)))))
    val json =
      """{"database":"d","table":"rich","type":"insert","ts":1,
        |"data":{"id":1,"price":12.34,"tags":["a","b"],"attrs":{"x":7}}}"""
        .stripMargin.replace("\n", "")
    val ds = spark.createDataset(Seq(json))(
      org.apache.spark.sql.Encoders.STRING)
    val after = RowDecoder.changeEvents(Maxwell.parseEnvelope(ds), richSpec)
      .select("after.*").collect()(0)
    assert(after.getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("12.34")) == 0)
    assert(after.getSeq[String](after.fieldIndex("tags")) == Seq("a", "b"))
    assert(after.getAs[Map[String, Long]]("attrs") == Map("x" -> 7L))
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
