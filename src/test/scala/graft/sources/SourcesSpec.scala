package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Batch/stream source surface: format round-trips preserve data. */
class SourcesSpec extends SparkSpec {

  lazy val docs = graft.Tables.load(spark, sfDir, "documents")

  test("csv round-trip (quoted text with embedded delimiters)") {
    val dir = Files.createTempDirectory("csv").toString + "/docs"
    docs.write.option("header", "true").option("quoteAll", "true")
      .mode("overwrite").csv(dir)
    val back = Sources.csv(spark, dir, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0)
  }

  test("json-lines round-trip") {
    val dir = Files.createTempDirectory("json").toString + "/docs"
    docs.write.mode("overwrite").json(dir)
    val back = Sources.jsonLines(spark, dir, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0)
  }

  test("streaming text source feeds the Maxwell pipeline") {
    val dir = Files.createTempDirectory("txt").toString + "/log"
    graft.cdc.ChangelogGen.ordersChangelog(spark, sfDir).select("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val stream = Sources.streamText(spark, dir)
    assert(stream.isStreaming)
    val q = graft.cdc.Maxwell.parseEnvelopeCol(stream, col("value"))
      .writeStream.outputMode("append")
      .format("memory").queryName("srctext")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.table("srctext").count()
    assert(n == graft.cdc.ChangelogGen.ordersChangelog(spark, sfDir).count())
  }

  test("rate source produces a streaming frame with the expected schema") {
    val r = Sources.streamRate(spark, 10)
    assert(r.isStreaming)
    assert(r.schema.fieldNames.toSeq == Seq("timestamp", "value"))
  }

  test("kafka reader options: extras (SASL/minPartitions) pass through, core keys win") {
    val extras = Map(
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism" -> "SCRAM-SHA-512",
      "kafka.sasl.jaas.config" -> "org.apache.kafka.common.security.scram.ScramLoginModule required;",
      "minPartitions" -> "64",
      "subscribe" -> "evil-override") // must NOT win over the named param
    val opts = Sources.kafkaReaderOptions(
      "broker:9092", "srv.db.tbl", "earliest", extras)
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "srv.db.tbl")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(opts("kafka.sasl.mechanism") == "SCRAM-SHA-512")
    assert(opts("minPartitions") == "64")
  }

  test("kafka writer options: extras pass through, core keys win") {
    val opts = Sources.kafkaWriterOptions("broker:9092", "graft.views.topk",
      Map("kafka.security.protocol" -> "SASL_SSL",
          "topic" -> "should-lose",
          "kafka.transactional.id" -> "relay-1"))
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("topic") == "graft.views.topk")
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(opts("kafka.transactional.id") == "relay-1")
  }

  test("orc round-trip with partition pruning") {
    val dir = Files.createTempDirectory("osink").toString + "/docs"
    Sources.orcSink(docs, dir, partitionBy = Seq("lang"))
    val back = Sources.orc(spark, dir)
    assert(back.count() == docs.count())
    // values survive the format round-trip exactly
    val a = docs.select("doc_id", "text").orderBy("doc_id")
    val b = back.select("doc_id", "text").orderBy("doc_id")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")))
  }

  test("parquet sink partitions by the requested keys") {
    val dir = Files.createTempDirectory("psink").toString + "/docs"
    Sources.parquetSink(docs, dir, partitionBy = Seq("lang"))
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")))
    // partition pruning: reading one language touches one directory
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(one.count() == docs.filter(col("lang") === "en").count())
  }
}
