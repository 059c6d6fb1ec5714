package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.2 scans/sources + sinks rows).
  *
  * The reference's only source is a Kafka consumer group (R1) and its only
  * "sinks" are handler callbacks (R13). The engine generalizes both:
  * batch + streaming readers over the formats a data platform actually
  * has, and writer builders for the materialization targets. Everything is
  * a thin, typed veneer over `spark.read`/`readStream` — Catalyst keeps
  * pushdown/pruning; nothing here adds an abstraction penalty.
  */
object Sources {

  // ---- batch readers ----

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def jdbc(spark: SparkSession, url: String, table: String,
           props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** ORC (the other columnar format a lakehouse actually has lying
    * around) — same pushdown/pruning guarantees as parquet. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  // ---- streaming readers ----

  def streamParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  def streamJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  def streamText(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema("value STRING").format("text").load(path)

  /** Kafka topic stream (config swap for the file sources; the CDC
    * pipeline downstream is identical — see CdcStream.kafkaChangelog).
    *
    * `options` passes arbitrary reader/consumer options through — SASL
    * (`kafka.sasl.jaas.config`, `kafka.security.protocol`),
    * `minPartitions`, `kafka.isolation.level`, etc. The reference declares
    * SASL fields it never wires (`/root/reference/config.go:22-27`) and a
    * protocol-version parse (`cdc_manager.go:116-126`); here a secured or
    * tuned cluster is reachable by config alone, no engine edit. Core keys
    * (servers/subscribe/offsets) are set from the named parameters and
    * win over duplicates in `options`. */
  def streamKafka(spark: SparkSession, bootstrap: String, subscribe: String,
                  startingOffsets: String = "earliest",
                  options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format("kafka")
      .options(kafkaReaderOptions(bootstrap, subscribe, startingOffsets, options))
      .load()

  /** The effective Kafka reader option map (named params win over extras).
    * Factored out so option plumbing is unit-testable without a broker. */
  def kafkaReaderOptions(bootstrap: String, subscribe: String,
                         startingOffsets: String,
                         extra: Map[String, String]): Map[String, String] =
    extra ++ Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> subscribe,
      "startingOffsets" -> startingOffsets)

  /** Kafka OUT for the CDC relay: stream a `value` column (e.g.
    * `Maxwell.formatEnvelope` lines — a maintained view's changelog as a
    * derived topic) to a Kafka topic. Same option-plumbing philosophy as
    * [[streamKafka]]: SASL/transactional extras pass through by config,
    * core keys win; unit-testable without a broker via
    * [[kafkaWriterOptions]]. Returns the started query (checkpointed —
    * the Kafka sink is at-least-once; keyed consumers dedup by design
    * since the relay's DML is idempotent per key). */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String,
                checkpointPath: String,
                options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("kafka")
      .options(kafkaWriterOptions(bootstrap, topic, options))
      .option("checkpointLocation", checkpointPath)
      .start()

  /** The effective Kafka writer option map (named params win). */
  def kafkaWriterOptions(bootstrap: String, topic: String,
                         extra: Map[String, String]): Map[String, String] =
    extra ++ Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "topic" -> topic)

  /** Synthetic rate source (events/sec) for replay/load testing. */
  def streamRate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  // ---- sinks ----

  /** Partitioned parquet writer — the materialized-state table shape.
    * `partitionBy` keys become directory partitions (partition pruning on
    * read); `bucketBy` (via saveAsTable) co-locates join keys. */
  def parquetSink(df: DataFrame, path: String,
                  partitionBy: Seq[String] = Nil,
                  mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** ORC writer, mirroring [[parquetSink]]. */
  def orcSink(df: DataFrame, path: String,
              partitionBy: Seq[String] = Nil,
              mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }

  /** JDBC upsert-style sink per BASELINE.json `spark_approach` — append
    * or overwrite into an RDBMS table (true MERGE needs the target DB's
    * dialect; at-least-once append + idempotent key handling is the
    * portable form). */
  def jdbcSink(df: DataFrame, url: String, table: String,
               mode: String = "append",
               props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
