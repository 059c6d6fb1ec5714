package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed row decode — the Spark analogue of the reference's reflective
  * `MaxwellUnmarshal` (`/root/reference/cdc_utils.go:31-124`), re-expressed
  * as `from_json` + per-column cast expressions so the whole decode runs
  * inside whole-stage codegen (no per-row reflection, no UDFs).
  *
  * Coercion rules (§1.2 of SURVEY.md), with the reference's quirks FIXED by
  * default and reproducible via `strictParity = true`:
  *
  *  - timestamps: accept both `"yyyy-MM-dd HH:mm:ss[.SSS]"` strings and
  *    epoch-millis numbers (`cdc_utils.go:69-94`). Fixed mode parses
  *    fractional seconds; strict parity reproduces quirk Q1 (fractional
  *    seconds -> NULL, `tag.go:48-53`).
  *  - booleans: fixed mode accepts 1/0/true/false; strict parity reproduces
  *    quirk Q2 (only `1 -> true`, everything else false,
  *    `cdc_utils.go:98-101`).
  *  - numerics: JSON numbers cast to the declared integral/floating type
  *    (`cdc_utils.go:104-107`); decimals/arrays/maps are SUPPORTED here
  *    rather than silently skipped (`cdc_utils.go:96-123` has no case).
  *  - NULL / missing key -> SQL NULL (reference leaves Go zero values,
  *    `cdc_utils.go:64-67`; zero-value parity is a caller-side
  *    `coalesce(col, zero)` if ever needed).
  */
object RowDecoder {

  /** Decode one raw-JSON image column (`data` or `old`) into a typed struct
    * column named `as`, applying renames/drops/coercions from the spec. */
  def decodeImage(spec: TableSpec, image: Column, as: String,
                  strictParity: Boolean = false): Column = {
    val parsed = from_json(image, spec.jsonSchema, Map("mode" -> "PERMISSIVE"))
    val inverse = spec.renames.map(_.swap) // columnName -> jsonKey
    val fields = spec.schema.fields.toSeq
      .filterNot(f => spec.dropped.contains(f.name))
      .map { f =>
        val key = inverse.getOrElse(f.name, f.name)
        val raw = parsed.getField(key)
        coerce(raw, f.dataType, strictParity).as(f.name)
      }
    struct(fields: _*).as(as)
  }

  private def coerce(raw: Column, dt: DataType, strict: Boolean): Column =
    dt match {
      case TimestampType =>
        // try_* variants: a malformed value degrades to NULL instead of
        // failing the job under ANSI mode — the analogue of the
        // reference's recover-and-skip-field policy (cdc_utils.go:50-54).
        if (strict) {
          // Quirk Q1: layout "2006-01-02 15:04:05" only — fractional
          // seconds fail the parse and the field stays unset (NULL here).
          coalesce(
            try_to_timestamp(raw, lit("yyyy-MM-dd HH:mm:ss")),
            timestamp_millis(raw.try_cast(LongType)))
        } else {
          // Fixed: try full-precision string forms, then epoch millis.
          coalesce(
            try_to_timestamp(raw), // "yyyy-MM-dd HH:mm:ss[.SSSSSS]" & ISO
            timestamp_millis(raw.try_cast(LongType)))
        }
      case BooleanType =>
        if (strict) raw === lit("1") // Quirk Q2: only 1 -> true
        else
          when(raw.isin("1", "true", "TRUE", "t"), lit(true))
            .when(raw.isin("0", "false", "FALSE", "f"), lit(false))
            .otherwise(lit(null).cast(BooleanType))
      case other => raw.try_cast(other)
    }

  /** Envelope -> well-typed change events for one registered table:
    * `(op, database, table, ts, seq, before, after)`.
    *
    * Op routing follows `cdc_manager.go:219-261`:
    *  - insert: after = data, before = NULL
    *  - update: after = data, before = old (quirk Q3: Maxwell's `old` holds
    *    only CHANGED columns; unchanged columns are NULL in `before`.
    *    `backfillBefore = true` fills them from `after` — the behavior the
    *    reference prepared but commented out, `cdc_manager.go:263-274`)
    *  - delete: the row image arrives in `data` and is exposed as `after`
    *    (quirk Q4, `cdc_manager.go:249-256`) — convenient, since the key is
    *    then always readable from `after` for every op.
    *
    * `seq` is a per-source monotonic sequence used only as a deterministic
    * tie-break for events sharing the same commit ts.
    *
    * `changed_cols` (update events only) lists the decoded column names
    * whose keys are PRESENT in the raw `old` JSON — this disambiguates
    * "old value was SQL NULL" (key present, value null) from "column
    * unchanged" (key absent), which decode alone cannot distinguish after
    * `old` becomes a typed struct. Downstream delta logic (IncrementalAgg)
    * keys off it instead of guessing via coalesce.
    */
  def changeEvents(envelope: DataFrame, spec: TableSpec,
                   strictParity: Boolean = false,
                   backfillBefore: Boolean = false): DataFrame = {
    // Maxwell BOOTSTRAP normalization: `bootstrap-insert` rows carry a
    // full row image in `data` exactly like inserts — surface them AS
    // inserts so every downstream maintainer (materializer, aggregates,
    // join views) folds a bootstrapped table correctly instead of
    // silently dropping the backfill; `bootstrap-start`/`-complete` are
    // imageless markers and are dropped here. Without this, the
    // materialized state (which folds any non-delete op) and the
    // aggregate maintainers (which keep only the three core ops) would
    // DIVERGE on a bootstrapped topic.
    val forTable = envelope.filter(
      col("database") === spec.database && col("table") === spec.table &&
        col("type").isin("insert", "update", "delete", "bootstrap-insert"))
      .withColumn("type",
        when(col("type") === "bootstrap-insert", "insert")
          .otherwise(col("type")))
    val after = decodeImage(spec, col("data"), "after", strictParity)
    val beforeRaw = decodeImage(spec, col("old"), "before_raw", strictParity)
    val withImages = forTable
      .withColumn("after", after)
      .withColumn("before_raw",
        when(col("type") === "update", beforeRaw)
          .otherwise(lit(null).cast(spec.decodedStructType)))
    val before =
      if (!backfillBefore) col("before_raw")
      else {
        // fill unchanged (NULL) columns of `old` from the after-image
        val cols = spec.schema.fields.toSeq
          .filterNot(f => spec.dropped.contains(f.name))
          .map(f => coalesce(col(s"before_raw.${f.name}"),
                             col(s"after.${f.name}")).as(f.name))
        when(col("type") === "update", struct(cols: _*))
          .otherwise(lit(null).cast(spec.decodedStructType))
      }
    val seq = if (envelope.columns.contains("seq")) col("seq") else lit(0L)
    // decoded column names present in the raw `old` JSON (renames applied)
    val renameLit = typedLit(spec.renames) // jsonKey -> columnName
    val changedCols =
      when(col("type") === "update",
        transform(json_object_keys(col("old")),
          k => coalesce(element_at(renameLit, k), k)))
        .otherwise(lit(null).cast("array<string>"))
    withImages.select(
      col("type").as("op"),
      col("database"), col("table"),
      col("ts"), seq.as("seq"),
      before.as("before"), col("after"),
      changedCols.as("changed_cols"))
  }

  /** Decode one image (`data`/`old`) straight out of the envelope VARIANT
    * (`Maxwell.parseEnvelopeVariantCol`): numerics extract typed via
    * `try_variant_get` (JSON number -> declared type, NULL on mismatch —
    * the same lenience as the PERMISSIVE from_json pass), timestamps and
    * booleans extract as strings and run the SAME [[coerce]] rules as the
    * from_json path, so the two decode paths are value-identical. */
  def decodeImageVariant(spec: TableSpec, v: Column, image: String,
                         as: String, strictParity: Boolean = false): Column = {
    val inverse = spec.renames.map(_.swap) // columnName -> jsonKey
    val fields = spec.schema.fields.toSeq
      .filterNot(f => spec.dropped.contains(f.name))
      .map { f =>
        val key = inverse.getOrElse(f.name, f.name)
        val path = s"$$.$image.$key"
        f.dataType match {
          case TimestampType | BooleanType =>
            coerce(try_variant_get(v, path, "string"), f.dataType,
                   strictParity).as(f.name)
          case other =>
            try_variant_get(v, path, other.sql).as(f.name)
        }
      }
    struct(fields: _*).as(as)
  }

  /** [[changeEvents]] on the VARIANT envelope — identical output columns
    * and coercions, one JSON parse per event total. `changed_cols` still
    * inspects raw-`old` key presence: the `old` sub-variant is
    * re-serialized (`to_json`) for UPDATE rows only, which is |updates|-
    * bounded work, not per-event. */
  def changeEventsVariant(envelope: DataFrame, spec: TableSpec,
                          strictParity: Boolean = false,
                          backfillBefore: Boolean = false): DataFrame = {
    val forTable = envelope.filter(
      col("database") === spec.database && col("table") === spec.table)
    val v = col("v")
    val after = decodeImageVariant(spec, v, "data", "after", strictParity)
    val beforeRaw = decodeImageVariant(spec, v, "old", "before_raw", strictParity)
    val withImages = forTable
      .withColumn("after", after)
      .withColumn("before_raw",
        when(col("type") === "update", beforeRaw)
          .otherwise(lit(null).cast(spec.decodedStructType)))
    val before =
      if (!backfillBefore) col("before_raw")
      else {
        val cols = spec.schema.fields.toSeq
          .filterNot(f => spec.dropped.contains(f.name))
          .map(f => coalesce(col(s"before_raw.${f.name}"),
                             col(s"after.${f.name}")).as(f.name))
        when(col("type") === "update", struct(cols: _*))
          .otherwise(lit(null).cast(spec.decodedStructType))
      }
    val seq = if (envelope.columns.contains("seq")) col("seq") else lit(0L)
    val renameLit = typedLit(spec.renames) // jsonKey -> columnName
    val changedCols =
      when(col("type") === "update",
        transform(json_object_keys(to_json(try_variant_get(v, "$.old", "variant"))),
          k => coalesce(element_at(renameLit, k), k)))
        .otherwise(lit(null).cast("array<string>"))
    withImages.select(
      col("type").as("op"),
      col("database"), col("table"),
      col("ts"), seq.as("seq"),
      before.as("before"), col("after"),
      changedCols.as("changed_cols"))
  }

  implicit private class SpecOps(spec: TableSpec) {
    def decodedStructType: StructType =
      StructType(spec.schema.fields.filterNot(f => spec.dropped.contains(f.name)))
  }
}
