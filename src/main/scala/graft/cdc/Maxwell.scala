package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maxwell CDC envelope parsing — the Spark-native analogue of the
  * reference's envelope decode (`/root/reference/cdc_utils.go:14-21`,
  * `cdc_manager.go:208-218`).
  *
  * The envelope is a fixed outer schema; `data` / `old` are kept as RAW JSON
  * STRINGS at this layer (Spark's JacksonParser returns the raw text of a
  * JSON object when the target field type is StringType). Per-table typed
  * decode happens in a second `from_json` pass driven by [[TableSpec]] — the
  * analogue of the reference's reflective `MaxwellUnmarshal`
  * (`cdc_utils.go:31-124`), except it runs inside whole-stage codegen
  * instead of per-row reflection.
  *
  * Scale note: envelope parse is a narrow map — no shuffle, fully
  * codegen'd, linear in input bytes. At 100 TB this is the same shape as
  * any Kafka->Spark ingest: parallelism = source partitions.
  */
/** Typed envelope row (`op` = Maxwell `type`); `data`/`old` are raw JSON
  * strings at this layer. */
final case class CdcEnvelope(database: String, table: String, op: String,
                             ts: Long, data: String, old: Option[String])

object Maxwell {

  /** Maxwell envelope (`cdc_utils.go:14-21`):
    * {"database","table","type","ts","data":{...},"old":{...}} */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),     // insert | update | delete
    StructField("ts", LongType),         // commit time, epoch seconds
    StructField("data", StringType),     // row image after change (raw JSON)
    StructField("old", StringType)))     // changed cols' old values (update)

  /** Parse a stream/batch of Maxwell JSON lines into envelope columns.
    * Malformed lines follow the reference's policy of "log and skip"
    * (`cdc_manager.go:214-218`): PERMISSIVE parse yields a null struct which
    * we filter out, instead of failing the job.
    */
  def parseEnvelope(lines: Dataset[String]): DataFrame = {
    lines.select(
        from_json(col("value"), envelopeSchema,
          Map("mode" -> "PERMISSIVE")).as("e"))
      .filter(col("e").isNotNull && col("e.type").isNotNull)
      .select("e.*")
  }

  /** Envelope parse with a corrupt-record sidecar (R18 error-policy
    * surface): malformed lines land in `_corrupt_record` instead of being
    * silently dropped, so a dead-letter sink can keep them — the
    * observability the reference's log-and-skip never had. Returns the
    * envelope columns plus `_corrupt_record` (NULL for good rows). */
  def parseEnvelopeWithCorrupt(lines: Dataset[String]): DataFrame = {
    val schemaWithCorrupt = StructType(
      envelopeSchema.fields :+ StructField("_corrupt_record", StringType))
    lines.select(
        from_json(col("value"), schemaWithCorrupt,
          Map("mode" -> "PERMISSIVE",
              "columnNameOfCorruptRecord" -> "_corrupt_record")).as("e"))
      .select("e.*")
  }

  /** Typed surface: `Dataset[CdcEnvelope]` via the case-class Encoder —
    * the analogue of the reference's user-facing `CDCSchema` struct
    * (`cdc_utils.go:14-21`). */
  def typedEnvelope(lines: Dataset[String]): Dataset[CdcEnvelope] = {
    implicit val enc: org.apache.spark.sql.Encoder[CdcEnvelope] =
      org.apache.spark.sql.Encoders.product[CdcEnvelope]
    parseEnvelope(lines)
      .select(col("database"), col("table"), col("type").as("op"),
              col("ts"), col("data"), col("old"))
      .as[CdcEnvelope]
  }

  /** Same, but starting from a DataFrame with a binary/string `value`
    * column — the shape `spark.readStream.format("kafka")` produces.
    * Kafka source is therefore a config swap, not new code
    * (SURVEY.md §7 stage 3). */
  def parseEnvelopeCol(df: DataFrame, value: Column): DataFrame = {
    df.select(from_json(value.cast("string"), envelopeSchema,
        Map("mode" -> "PERMISSIVE")).as("e"))
      .filter(col("e").isNotNull && col("e.type").isNotNull)
      .select("e.*")
  }

  /** MAXWELL OUT — serialize decoded change events `(op, ts, before,
    * after)` back into Maxwell JSON lines (`value` column), making the
    * engine a CDC RELAY: any derived change stream — a maintained view's
    * changelog via `CdcStream.changelogAsEvents`, a filtered/reshaped
    * event stream — re-publishes as a topic ANY Maxwell consumer (this
    * engine included, or the reference itself) can subscribe to. Wire
    * shape per op mirrors the reference's protocol: insert `data` only;
    * update `data` + `old` (the FULL before image — a superset of
    * Maxwell's changed-only `old`, which Q3-exact decoding handles
    * identically since key-presence marks the old value known); delete
    * carries the image in `data` (quirk Q4). NULL columns are omitted,
    * matching Maxwell, and decode back to SQL NULL. `seq` does not ride
    * the envelope (the protocol's `ts` is epoch SECONDS and carries no
    * finer order — the reference lives with the same limit,
    * `cdc_utils.go:18`); a re-parse re-derives seq from source order. */
  def formatEnvelope(events: DataFrame, database: String,
                     table: String): DataFrame =
    events.select(to_json(struct(
      lit(database).as("database"), lit(table).as("table"),
      col("op").as("type"), col("ts").as("ts"),
      col("after").as("data"),
      when(col("op") === "update", col("before")).as("old")),
      // Maxwell's wire format for datetimes (see the reference fixture
      // `test/fff.json`: "2022-02-14 15:03:37.423") — to_json's ISO-8601
      // default would not re-decode through the layout parser
      Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSS")).as("value"))

  /** VARIANT-based envelope parse. One binary `try_parse_json` per line;
    * header fields come out via `variant_get` and the row images stay
    * INSIDE the variant (`v`), so the per-table typed decode
    * ([[RowDecoder.changeEventsVariant]]) extracts each column directly
    * instead of running a second from_json over the `data`/`old` text.
    * Same malformed-line policy as [[parseEnvelope]] (null parse or
    * missing `type` -> dropped); value-identical output (CdcSpec parity
    * test sweeps quirk modes).
    *
    * When to use which: on this engine's NARROW synthetic envelope
    * (6 scalar fields) the classic double-from_json measures FASTER —
    * one struct parse beats 12 binary path probes, and VARIANT columns
    * cache worse than strings — so the from_json path stays the default.
    * The variant path wins when payloads are WIDE or only partially
    * consumed (decode extracts just the registered columns without
    * parsing the rest), which is the schema-evolution-heavy production
    * case it is kept for. */
  /** Debezium envelope (declared-but-dormant in the reference,
    * `cdc_manager.go:102-106`: `after`/`before` raw JSON + `op`), flat
    * form (`schemas.enable=false`). `before`/`after` stay raw JSON
    * strings, same layering as the Maxwell path. */
  val debeziumSchema: StructType = StructType(Seq(
    StructField("before", StringType),   // row image before change (raw JSON)
    StructField("after", StringType),    // row image after change (raw JSON)
    StructField("op", StringType),       // c | u | d | r
    StructField("ts_ms", LongType),      // commit time, epoch millis
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType))))))

  /** Parse Debezium-envelope JSON lines and NORMALIZE to the Maxwell
    * envelope column shape (`database, table, type, ts, data, old`), so
    * every downstream stage — [[RowDecoder]], [[Materializer]], the op
    * router — runs unchanged regardless of which connector feeds the
    * topic. Semantic mapping:
    *   - op: c (create) and r (snapshot read) -> insert; u -> update;
    *     d -> delete
    *   - data: Debezium deletes carry the image in `before` (`after` is
    *     null), Maxwell's quirk Q4 carries it in `data` -> coalesce
    *   - old: Debezium updates carry the FULL old image in `before`
    *     (Maxwell's `old` is partial — only changed columns); both decode
    *     through the same `try_*` casts downstream
    *   - ts: ts_ms is millis, Maxwell ts is epoch seconds -> divide
    * Malformed lines and unmapped ops (Debezium `t` truncate, `m`
    * message) are DROPPED silently, like [[parseEnvelopeCol]]; a
    * dead-letter pipeline wanting to keep them should parse with a
    * corrupt-record sidecar first (the [[parseEnvelopeWithCorrupt]]
    * pattern applied to [[debeziumSchema]]) and route the remainder
    * here. */
  def parseDebeziumCol(df: DataFrame, value: Column): DataFrame = {
    df.select(from_json(value.cast("string"), debeziumSchema,
        Map("mode" -> "PERMISSIVE")).as("e"))
      .filter(col("e").isNotNull && col("e.op").isNotNull)
      .select(
        col("e.source.db").as("database"),
        col("e.source.table").as("table"),
        when(col("e.op").isin("c", "r"), "insert")
          .when(col("e.op") === "u", "update")
          .when(col("e.op") === "d", "delete").as("type"),
        (col("e.ts_ms") / 1000).cast("long").as("ts"),
        coalesce(col("e.after"), col("e.before")).as("data"),
        when(col("e.op") === "u", col("e.before")).as("old"))
      .filter(col("type").isNotNull)
  }

  def parseEnvelopeVariantCol(df: DataFrame, value: Column,
                              passthrough: Seq[String] = Nil): DataFrame = {
    val keep = passthrough.map(col)
    df.select(keep :+ try_parse_json(value.cast("string")).as("v"): _*)
      .filter(col("v").isNotNull)
      .select(keep ++ Seq(
        try_variant_get(col("v"), "$.database", "string").as("database"),
        try_variant_get(col("v"), "$.table", "string").as("table"),
        try_variant_get(col("v"), "$.type", "string").as("type"),
        try_variant_get(col("v"), "$.ts", "bigint").as("ts"),
        col("v")): _*)
      .filter(col("type").isNotNull)
  }
}
