package graft.cdc

import org.apache.spark.sql.types._

/** Per-table decode spec — the Spark analogue of the reference's
  * `Register(group, db, table, model, handlers)` registry
  * (`/root/reference/cdc_manager.go:370-403`) plus the gorm-tag machinery:
  *
  *  - `schema`      : declared column types, analogue of the Go struct's
  *                    `reflect.Type` (`cdc_manager.go:388`)
  *  - `renames`     : jsonKey -> columnName, analogue of gorm `column:` tags
  *                    (`/root/reference/tag.go:9-22`)
  *  - `dropped`     : json keys excluded, analogue of gorm:"-"
  *                    (`cdc_utils.go:134-136`)
  *  - `primaryKey`  : upsert key for materialization (every real handler's
  *                    job in the reference)
  *
  * Embedded-struct flattening (`cdc_utils.go:126-156`) has no analogue
  * needed: the declared schema IS the flat column list; a nested StructType
  * can be star-expanded by the caller before registering.
  */
/** @param renamedColumns VERSION MAP across spec generations: when an
  *        upstream `ALTER TABLE RENAME COLUMN` lands, re-register the
  *        spec with the new schema plus `old column name -> new column
  *        name` here; a restarted stream's state merge re-keys the prior
  *        generation's columns so renamed history is preserved (see
  *        [[Materializer.merge]]'s `renamedColumns`). Distinct from
  *        `renames`, which maps JSON payload keys within ONE generation. */
final case class TableSpec(
    database: String,
    table: String,
    primaryKey: Seq[String],
    schema: StructType,
    renames: Map[String, String] = Map.empty,
    dropped: Set[String] = Set.empty,
    renamedColumns: Map[String, String] = Map.empty) {

  /** Topic naming parity: `serverName.databaseName.tableName`
    * (`cdc_manager.go:390-391`). */
  def topic(serverName: String): String = s"$serverName.$database.$table"

  /** The schema keyed by JSON payload keys (inverse renames applied),
    * used for the `from_json(data, ...)` pass. Timestamp fields are
    * declared as STRING at parse time: Maxwell carries timestamps either
    * as `"yyyy-MM-dd HH:mm:ss[.SSS]"` strings or epoch-millis numbers
    * (`cdc_utils.go:69-94`), so the typed coercion is a post-parse
    * `coalesce(to_timestamp, timestamp_millis)` in [[RowDecoder]].
    */
  def jsonSchema: StructType = {
    val inverse = renames.map(_.swap) // columnName -> jsonKey
    StructType(schema.fields.map { f =>
      val key = inverse.getOrElse(f.name, f.name)
      val dt = f.dataType match {
        case TimestampType => StringType
        case BooleanType   => StringType // "1"/"0"/"true"/"false" handled post-parse
        case other         => other
      }
      StructField(key, dt, nullable = true)
    })
  }
}

object TableSpec {
  /** Derive a spec from a case class — the analogue of the reference
    * registering a Go struct's `reflect.Type` as the table schema
    * (`cdc_manager.go:388`). Field names become column names; use
    * `renames` for payload keys that differ (gorm `column:` tags) and
    * `dropped` for excluded fields (gorm:"-").
    *
    * Embedded case classes are recursively FLATTENED into the parent
    * column list — parity with the reference's embedded-struct handling
    * (`GetModelFields`, `cdc_utils.go:126-156`), which is how gorm's
    * common `Model{ID, CreatedAt, UpdatedAt, DeletedAt}` base registers
    * as flat columns (`cdc_utils_test.go:17-29`). Timestamps need no
    * exemption here (the reference exempts `time.Time` because it IS a
    * struct in Go; Spark maps it to a scalar TimestampType). Duplicate
    * column names after flattening fail fast — silent last-wins would
    * decode the wrong field. */
  def fromCaseClass[T <: Product : scala.reflect.runtime.universe.TypeTag](
      database: String, table: String, primaryKey: Seq[String],
      renames: Map[String, String] = Map.empty,
      dropped: Set[String] = Set.empty): TableSpec = {
    val raw = org.apache.spark.sql.catalyst.ScalaReflection
      .schemaFor[T].dataType.asInstanceOf[StructType]
    val schema = flatten(raw)
    val dups = schema.fieldNames.groupBy(identity).collect {
      case (n, occ) if occ.length > 1 => n
    }
    require(dups.isEmpty,
      s"fromCaseClass: duplicate column name(s) after flattening " +
        s"embedded case classes: ${dups.mkString(", ")}")
    TableSpec(database, table, primaryKey, schema, renames, dropped)
  }

  /** Recursively flatten nested StructType fields into the parent list
    * (embedded-base-model shape; `cdc_utils.go:126-156`). */
  private[cdc] def flatten(st: StructType): StructType =
    StructType(st.fields.flatMap { f =>
      f.dataType match {
        case nested: StructType => flatten(nested).fields
        case _                  => Array(f)
      }
    })
}

/** Registry of table specs — `Map[topic -> spec]`, the engine's whole
  * "plan" object, mirroring the reference's `map[string]*ConsumerGroup`
  * (`cdc_manager.go:402`). Duplicate registration fails fast like the
  * reference's panic (`cdc_manager.go:380-386`). */
final case class TableRegistry(specs: Map[(String, String), TableSpec] = Map.empty) {
  def register(spec: TableSpec): TableRegistry = {
    val key = (spec.database, spec.table)
    require(!specs.contains(key), s"duplicate registration for $key")
    TableRegistry(specs + (key -> spec))
  }
  def get(database: String, table: String): Option[TableSpec] =
    specs.get((database, table))
  def all: Seq[TableSpec] = specs.values.toSeq
}
