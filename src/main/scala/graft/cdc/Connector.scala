package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Handler-callback surface — the Spark analogue of the reference's public
  * API (`/root/reference/cdc_manager.go`):
  *
  *  - `CdcHandler`        ~ `ConsumerHandler` (`cdc_manager.go:43-47`)
  *  - `Connector.register` ~ `Register(group, db, table, model, handlers)`
  *                           (`cdc_manager.go:370-403`)
  *  - `Connector.start`    ~ `StartConnector` / `Connector.Start`
  *                           (`cdc_manager.go:343-364`)
  *
  * Differences, deliberate (SURVEY.md §1.2 quirk decisions):
  *  - `onDelete` receives the deleted row image under its honest name
  *    (the reference names the param `before` but passes the `data` image,
  *    quirk Q4 — same value, fixed naming).
  *  - handlers receive whole micro-batch DataFrames, not single rows: the
  *    per-row `Create(after)` loop does not survive 100 TB. `foreachRow`
  *    adapters are provided for literal parity where row-at-a-time side
  *    effects are genuinely wanted.
  *  - handler errors: logged and continue (parity with
  *    `cdc_manager.go:280-298` — errors logged, offsets still committed).
  */
trait CdcHandler extends Serializable {
  /** rows: after-images of inserts */
  def onCreate(after: DataFrame): Unit = ()
  /** rows: (before struct, after struct) pairs of updates */
  def onUpdate(beforeAfter: DataFrame): Unit = ()
  /** rows: row images of deletes */
  def onDelete(image: DataFrame): Unit = ()
}

/** Row-at-a-time adapter (literal parity with the reference's callback
  * shape) — for small driver-side side-effect handlers only; the batch
  * `CdcHandler` is the scale surface. Rows stream through the driver one
  * partition at a time (`toLocalIterator`), so driver memory holds at
  * most one partition, never the whole batch. */
abstract class RowCdcHandler extends CdcHandler {
  import scala.jdk.CollectionConverters._
  def createRow(after: Row): Unit = ()
  def updateRow(before: Row, after: Row): Unit = ()
  def deleteRow(image: Row): Unit = ()
  final override def onCreate(after: DataFrame): Unit =
    after.toLocalIterator().asScala.foreach(createRow)
  final override def onUpdate(ba: DataFrame): Unit =
    ba.toLocalIterator().asScala.foreach(r => updateRow(
      r.getAs[Row]("before"), r.getAs[Row]("after")))
  final override def onDelete(image: DataFrame): Unit =
    image.toLocalIterator().asScala.foreach(deleteRow)
}

/** Registration entry: one table spec + its handlers (R15). */
final case class Registration(spec: TableSpec, handlers: Seq[CdcHandler],
                              backfillBefore: Boolean = false)

/** The connector: registry + start, source-agnostic (file dir or Kafka).
  * One streaming query per registered table, all driven off a shared
  * envelope stream — the analogue of one consumer group per registration
  * with `NumOfConsumers` goroutines (`cdc_manager.go:351-364`); Spark's
  * task scheduler replaces the manual fan-out (parallelism = source
  * partitions, not user threads). */
final class Connector(spark: SparkSession, serverName: String = "graft") {
  private var registrations = Map.empty[(String, String), Registration]

  def register(spec: TableSpec, handlers: CdcHandler*): Connector = {
    val key = (spec.database, spec.table)
    require(!registrations.contains(key), s"duplicate registration for $key")
    registrations += key -> Registration(spec, handlers)
    this
  }

  def registrationFor(db: String, table: String): Option[Registration] =
    registrations.get((db, table))

  /** Topics this connector would subscribe (R15 naming). */
  def topics: Seq[String] =
    registrations.values.map(_.spec.topic(serverName)).toSeq.sorted

  /** Dispatch one envelope micro-batch to all registered handlers —
    * shared by streaming foreachBatch and batch replay. */
  private[cdc] def dispatch(envelope: DataFrame): Unit =
    registrations.values.foreach { reg =>
      val events = RowDecoder.changeEvents(envelope, reg.spec,
        backfillBefore = reg.backfillBefore)
      // cache: three filtered passes over the same decoded batch
      events.cache()
      try {
        val creates = events.filter(col("op") === "insert").select("after.*")
        val updates = events.filter(col("op") === "update")
          .select(col("before"), col("after"))
        val deletes = events.filter(col("op") === "delete").select("after.*")
        reg.handlers.foreach { h =>
          // error policy parity (cdc_manager.go:280-298): log + continue
          def safely(tag: String)(f: => Unit): Unit =
            try f catch {
              case e: Exception =>
                System.err.println(s"[graft-cdc] $tag handler failed: $e")
            }
          safely("create")(h.onCreate(creates))
          safely("update")(h.onUpdate(updates))
          safely("delete")(h.onDelete(deletes))
        }
      } finally events.unpersist()
    }

  /** Start against a file-based changelog directory (sandbox/test path).
    * Kafka: swap the source for `CdcStream.kafkaChangelog` — identical
    * downstream. */
  def startFileStream(dir: String, checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val envelope = graft.streaming.CdcStream.fileChangelog(spark, dir)
      .withColumn("seq", lit(0L))
    envelope.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) => dispatch(batch.toDF()) }
      .start()
  }

  /** Batch replay of an already-captured changelog (EP3-style library use:
    * envelope in, callbacks out, no streaming machinery). */
  def replayBatch(envelope: DataFrame): Unit = dispatch(envelope)
}
