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
