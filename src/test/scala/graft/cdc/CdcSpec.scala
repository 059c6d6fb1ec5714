package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

object CdcSpec {
  // top-level for TypeTag availability (reflect.TypeOf-parity test)
  case class Deal(id: Long, name: String, entity_type: Int,
                  active: Boolean, score: Double)
  // embedded-base shape (gorm's Model in cdc_utils_test.go:17-29): the
  // base's fields must flatten into the parent column list (R10)
  case class Base(id: Long, created_at: java.sql.Timestamp)
  case class DealWithBase(base: Base, name: String, entity_type: Int,
                          active: Boolean, score: Double)
  case class Clash(base: Base, id: Long) // `id` collides after flattening
}

/** Golden-envelope tests (SURVEY.md §5 test plan #1): Maxwell JSON in,
  * typed rows out — modeled on the reference's only fixture
  * (`/root/reference/test/fff.json`) plus the update/delete variants it
  * lacks, with the §1.2 quirks Q1-Q4 as explicit cases. */
class CdcSpec extends SparkSpec {

  val dealsSpec = TableSpec(
    database = "deal_test", table = "deals",
    primaryKey = Seq("id"),
    schema = StructType(Seq(
      StructField("id", LongType),
      StructField("created_at", TimestampType),
      StructField("name", StringType),       // renamed from entity_name
      StructField("entity_type", IntegerType),
      StructField("active", BooleanType),
      StructField("score", DoubleType))),
    renames = Map("entity_name" -> "name"),
    dropped = Set.empty)

  // modeled on test/fff.json: insert with fractional-second timestamp
  val insertJson =
    """{"database":"deal_test","table":"deals","type":"insert","ts":1644822217,
      |"data":{"id":7,"created_at":"2022-02-14 15:03:37.423","entity_name":"widget A",
      |"entity_type":0,"active":1,"score":3.5}}""".stripMargin.replace("\n", "")
  val updateJson =
    """{"database":"deal_test","table":"deals","type":"update","ts":1644822300,
      |"data":{"id":7,"created_at":"2022-02-14 15:03:37.423","entity_name":"widget B",
      |"entity_type":0,"active":1,"score":4.5},
      |"old":{"entity_name":"widget A","score":3.5}}""".stripMargin.replace("\n", "")
  val deleteJson =
    """{"database":"deal_test","table":"deals","type":"delete","ts":1644822400,
      |"data":{"id":7,"created_at":"2022-02-14 15:03:37.423","entity_name":"widget B",
      |"entity_type":0,"active":1,"score":4.5}}""".stripMargin.replace("\n", "")

  def parse(lines: String*) = {
    val ds = spark.createDataset(lines)(Encoders.STRING)
    Maxwell.parseEnvelope(ds)
  }

  test("envelope parse extracts outer fields, keeps data as raw JSON") {
    val env = parse(insertJson).collect()(0)
    assert(env.getAs[String]("database") == "deal_test")
    assert(env.getAs[String]("type") == "insert")
    assert(env.getAs[Long]("ts") == 1644822217L)
    assert(env.getAs[String]("data").contains("\"entity_name\""))
    assert(env.getAs[String]("old") == null)
  }

  test("debezium envelope normalizes to the Maxwell shape and decodes") {
    import org.apache.spark.sql.functions.col
    // same logical events as the Maxwell fixtures, Debezium-enveloped:
    // c carries after only; u carries full before+after; d carries before
    val dbzInsert =
      """{"before":null,"after":{"id":7,"created_at":"2022-02-14 15:03:37.423",
        |"entity_name":"widget A","entity_type":0,"active":1,"score":3.5},
        |"op":"c","ts_ms":1644822217000,
        |"source":{"db":"deal_test","table":"deals"}}"""
        .stripMargin.replace("\n", "")
    val dbzUpdate =
      """{"before":{"id":7,"created_at":"2022-02-14 15:03:37.423",
        |"entity_name":"widget A","entity_type":0,"active":1,"score":3.5},
        |"after":{"id":7,"created_at":"2022-02-14 15:03:37.423",
        |"entity_name":"widget B","entity_type":0,"active":1,"score":4.5},
        |"op":"u","ts_ms":1644822300000,
        |"source":{"db":"deal_test","table":"deals"}}"""
        .stripMargin.replace("\n", "")
    val dbzDelete =
      """{"before":{"id":7,"created_at":"2022-02-14 15:03:37.423",
        |"entity_name":"widget B","entity_type":0,"active":1,"score":4.5},
        |"after":null,"op":"d","ts_ms":1644822400000,
        |"source":{"db":"deal_test","table":"deals"}}"""
        .stripMargin.replace("\n", "")
    val garbage = """{"op":"x","after":null}"""
    val notJson = """not json at all"""
    val ds = spark.createDataset(
      Seq(dbzInsert, dbzUpdate, dbzDelete, garbage, notJson))(Encoders.STRING)
    val env = Maxwell.parseDebeziumCol(ds.toDF("value"), col("value"))
      .orderBy(col("ts"))
    val rows = env.collect()
    assert(rows.length == 3, "unknown-op and malformed lines are dropped")
    assert(rows.map(_.getAs[String]("type")).toSeq ==
      Seq("insert", "update", "delete"))
    assert(rows.forall(_.getAs[String]("database") == "deal_test"))
    assert(rows(0).getAs[Long]("ts") == 1644822217L) // millis -> seconds
    // delete image lands in `data` (Maxwell quirk Q4 parity)
    assert(rows(2).getAs[String]("data").contains("widget B"))
    // update's old image present, insert's absent
    assert(rows(1).getAs[String]("old").contains("widget A"))
    assert(rows(0).getAs[String]("old") == null)
    // the normalized envelope feeds the SAME typed decode unchanged
    val evs = RowDecoder.changeEvents(env, dealsSpec)
      .orderBy(col("ts")).collect()
    assert(evs(0).getAs[org.apache.spark.sql.Row]("after")
      .getAs[String]("name") == "widget A")
    assert(evs(1).getAs[org.apache.spark.sql.Row]("before")
      .getAs[Double]("score") == 3.5) // FULL old image decodes
    assert(evs(2).getAs[String]("op") == "delete")
  }

  test("insert decode: rename, types, fractional-second timestamp (fixed mode)") {
    val ev = RowDecoder.changeEvents(parse(insertJson), dealsSpec).collect()(0)
    val after = ev.getAs[org.apache.spark.sql.Row]("after")
    assert(ev.getAs[String]("op") == "insert")
    assert(after.getAs[Long]("id") == 7L)
    assert(after.getAs[String]("name") == "widget A") // column: rename applied
    assert(after.getAs[Int]("entity_type") == 0)
    assert(after.getAs[Boolean]("active"))
    assert(after.getAs[Double]("score") == 3.5)
    // FIXED semantics: fractional seconds survive (reference drops them, Q1)
    val ts = after.getAs[java.sql.Timestamp]("created_at")
    assert(ts != null && ts.toInstant.toString == "2022-02-14T15:03:37.423Z")
    assert(ev.getAs[org.apache.spark.sql.Row]("before") == null)
  }

  test("quirk Q1 strict parity: fractional-second timestamps are dropped") {
    val ev = RowDecoder.changeEvents(parse(insertJson), dealsSpec,
      strictParity = true).collect()(0)
    val after = ev.getAs[org.apache.spark.sql.Row]("after")
    assert(after.getAs[java.sql.Timestamp]("created_at") == null)
  }

  test("quirk Q2: boolean decode — fixed accepts 0/false, strict only 1") {
    val zero = insertJson.replace("\"active\":1", "\"active\":0")
    val fixed = RowDecoder.changeEvents(parse(zero), dealsSpec).collect()(0)
    assert(!fixed.getAs[org.apache.spark.sql.Row]("after").getAs[Boolean]("active"))
    val strict = RowDecoder.changeEvents(parse(zero), dealsSpec,
      strictParity = true).collect()(0)
    assert(!strict.getAs[org.apache.spark.sql.Row]("after").getAs[Boolean]("active"))
    val asTrue = RowDecoder.changeEvents(parse(insertJson), dealsSpec,
      strictParity = true).collect()(0)
    assert(asTrue.getAs[org.apache.spark.sql.Row]("after").getAs[Boolean]("active"))
  }

  test("quirk Q3: update exposes partial before; backfill option fills it") {
    val ev = RowDecoder.changeEvents(parse(updateJson), dealsSpec).collect()(0)
    val before = ev.getAs[org.apache.spark.sql.Row]("before")
    assert(before.getAs[String]("name") == "widget A")   // changed col present
    assert(before.getAs[Double]("score") == 3.5)
    assert(before.isNullAt(before.fieldIndex("id")))     // unchanged col NULL
    val filled = RowDecoder.changeEvents(parse(updateJson), dealsSpec,
      backfillBefore = true).collect()(0)
    val b2 = filled.getAs[org.apache.spark.sql.Row]("before")
    assert(b2.getAs[Long]("id") == 7L)                   // backfilled from after
    assert(b2.getAs[String]("name") == "widget A")       // old value kept
  }

  test("quirk Q3 exact: changed_cols distinguishes old-was-NULL from unchanged") {
    // `old` carries `"score": null` (old value was SQL NULL) and omits
    // `entity_name` (unchanged). After decode both are NULL in `before`;
    // only key presence in the raw JSON can tell them apart.
    val nullOld = updateJson.replace(
      """"old":{"entity_name":"widget A","score":3.5}""",
      """"old":{"score":null}""")
    val ev = RowDecoder.changeEvents(parse(nullOld), dealsSpec).collect()(0)
    val changed = ev.getSeq[String](ev.fieldIndex("changed_cols"))
    assert(changed == Seq("score"))
    // rename applied: old key entity_name surfaces as decoded name
    val ev2 = RowDecoder.changeEvents(parse(updateJson), dealsSpec).collect()(0)
    assert(ev2.getSeq[String](ev2.fieldIndex("changed_cols")).sorted ==
      Seq("name", "score"))
    // non-update events carry no changed_cols
    val ins = RowDecoder.changeEvents(parse(insertJson), dealsSpec).collect()(0)
    assert(ins.isNullAt(ins.fieldIndex("changed_cols")))
  }

  test("IncrementalAgg retracts NULL-group deltas exactly via changed_cols") {
    // key 7 moves from group NULL -> 'g1': the retract must hit the NULL
    // group (coalesce-backfill would wrongly retract from 'g1')
    val insert =
      """{"database":"deal_test","table":"deals","type":"insert","ts":1,
        |"data":{"id":7,"entity_name":null,"score":2.0}}"""
        .stripMargin.replace("\n", "")
    val update =
      """{"database":"deal_test","table":"deals","type":"update","ts":2,
        |"data":{"id":7,"entity_name":"g1","score":2.0},
        |"old":{"entity_name":null}}""".stripMargin.replace("\n", "")
    val events = RowDecoder.changeEvents(parse(insert, update), dealsSpec)
    val out = IncrementalAgg.sumCount(events, "name", "score")
      .collect().map(r => (r.getAs[String]("name"),
                           Option(r.getAs[Any]("sum_score")),
                           r.getAs[Long]("n_rows"))).toSet
    // NULL group: +2 (insert) then -2 (retract) -> pruned (n_rows == 0);
    // g1 group: +2
    assert(out == Set(("g1", Some(2.0), 1L)))
    // the fallback path without changed_cols is rejected for safety
    intercept[IllegalArgumentException] {
      IncrementalAgg.sumCount(events.drop("changed_cols"), "name", "score")
    }
  }

  test("IncrementalAgg.distinctCount survives deletes and value moves") {
    // two keys share value 'a' in one group; deleting ONE must not drop
    // the distinct value (multiplicity 2 -> 1), deleting BOTH must; a
    // value-moving update retracts the old value pair exactly
    def ev(op: String, ts: Long, id: Long, name: String,
           old: Option[String] = None) = {
      val o = old.map(v => s""","old":{"entity_name":"$v"}""").getOrElse("")
      s"""{"database":"deal_test","table":"deals","type":"$op","ts":$ts,"data":{"id":$id,"entity_name":"$name","score":1.0}$o}"""
    }
    val events = RowDecoder.changeEvents(parse(
      ev("insert", 1, 1, "a"), ev("insert", 2, 2, "a"),
      ev("insert", 3, 3, "b"),
      ev("delete", 4, 1, "a"),                  // a survives via id=2
      ev("update", 5, 3, "c", Some("b")),       // b -> c
      ev("delete", 6, 2, "a")),                 // a now gone
      dealsSpec)
    // distinct names per (constant) score group via the exact
    // changed_cols path: pairs a and b net to zero, only c survives
    val exact = IncrementalAgg.distinctCount(events, "score", "name")
      .collect().map(r => (r.getAs[Double]("score"),
                           r.getAs[Long]("n_distinct_name"))).toSet
    assert(exact == Set((1.0, 1L))) // only 'c' remains distinct
  }

  test("distinctCount: a live group whose values are all NULL reports 0") {
    // matches COUNT(DISTINCT v) GROUP BY g over the live state — the
    // group EXISTS with count 0, it must not vanish from the view
    val onlyNull =
      """{"database":"deal_test","table":"deals","type":"insert","ts":1,"data":{"id":1,"entity_name":null,"score":5.0}}"""
    val withVal =
      """{"database":"deal_test","table":"deals","type":"insert","ts":2,"data":{"id":2,"entity_name":"x","score":7.0}}"""
    val events = RowDecoder.changeEvents(parse(onlyNull, withVal), dealsSpec)
    val out = IncrementalAgg.distinctCount(events, "score", "name")
      .collect().map(r => (r.getAs[Double]("score"),
                           r.getAs[Long]("n_distinct_name"))).toSet
    assert(out == Set((5.0, 0L), (7.0, 1L)))
  }

  test("Maxwell OUT: formatEnvelope round-trips through the decoder") {
    // decode the golden fixtures, re-serialize, re-decode: the relay
    // must preserve op/ts/images bit-for-bit (seq excluded — the Maxwell
    // envelope has no sub-second order, same as the reference protocol)
    val ev1 = RowDecoder.changeEvents(
      parse(insertJson, updateJson, deleteJson), dealsSpec)
    val lines = Maxwell.formatEnvelope(ev1, "deal_test", "deals")
    // the emitted payload keys are the DECODED column names (the derived
    // topic's schema IS the decoded one), so the relay consumer
    // registers the same spec minus the original topic's renames
    val derivedSpec = dealsSpec.copy(renames = Map.empty)
    val ev2 = RowDecoder.changeEvents(
      Maxwell.parseEnvelope(lines.as[String](Encoders.STRING)), derivedSpec)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select(col("op"), col("ts"), col("after.id"), col("after.name"),
                col("after.score"), col("after.created_at"),
                col("before.score").as("old_score"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                   r.getString(3), r.getDouble(4),
                   String.valueOf(r.get(5)),
                   Option(r.get(6)).map(_.toString.toDouble))).toSet
    assert(shape(ev2) == shape(ev1),
      "relay round-trip must preserve ops, timestamps and images")
    // and the re-parsed stream materializes identically
    val s1 = Materializer.currentState(ev1, Seq("id"))
    val s2 = Materializer.currentState(
      ev2.withColumn("seq", lit(0L)), Seq("id"))
    assert(s1.count() == s2.count())
  }

  test("Maxwell bootstrap rows: inserts normalized, markers dropped") {
    // public Maxwell bootstrap emission: a start marker, one
    // bootstrap-insert per existing row (full image in `data`), a
    // complete marker — the backfill path every downstream maintainer
    // must fold exactly like live inserts
    val bootStart =
      """{"database":"deal_test","table":"deals","type":"bootstrap-start","ts":1644822000,"data":{}}"""
    val bootInsert =
      """{"database":"deal_test","table":"deals","type":"bootstrap-insert","ts":1644822000,
        |"data":{"id":3,"created_at":"2022-02-14 15:03:37.423","entity_name":"seeded",
        |"entity_type":1,"active":1,"score":1.5}}""".stripMargin.replace("\n", "")
    val bootComplete =
      """{"database":"deal_test","table":"deals","type":"bootstrap-complete","ts":1644822001,"data":{}}"""
    val ev = RowDecoder.changeEvents(
      parse(bootStart, bootInsert, bootComplete, insertJson), dealsSpec)
    val got = ev.select(col("op"), col("after.id"), col("after.name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == Set(("insert", 3L, "seeded"), ("insert", 7L, "widget A")),
      s"bootstrap rows must decode as inserts and markers must drop: ${got.toSeq}")
    // and the aggregate maintainers therefore COUNT the backfill — the
    // divergence this normalization exists to prevent
    val agg = IncrementalAgg.sumCount(ev, groupCol = "entity_type",
      valueCol = "score")
    assert(agg.collect().map(r => r.getAs[Long]("n_rows")).sum == 2L)
  }

  test("quirk Q4: delete carries the row image in after") {
    val ev = RowDecoder.changeEvents(parse(deleteJson), dealsSpec).collect()(0)
    assert(ev.getAs[String]("op") == "delete")
    val after = ev.getAs[org.apache.spark.sql.Row]("after")
    assert(after.getAs[Long]("id") == 7L)
    assert(after.getAs[String]("name") == "widget B")
    assert(ev.getAs[org.apache.spark.sql.Row]("before") == null)
  }

  test("epoch-millis timestamps decode via the numeric path") {
    val ms = insertJson.replace("\"created_at\":\"2022-02-14 15:03:37.423\"",
                                "\"created_at\":1644822217423")
    val ev = RowDecoder.changeEvents(parse(ms), dealsSpec).collect()(0)
    val ts = ev.getAs[org.apache.spark.sql.Row]("after")
      .getAs[java.sql.Timestamp]("created_at")
    assert(ts.toInstant.toEpochMilli == 1644822217423L)
  }

  test("null and missing columns decode to SQL NULL (not zero values)") {
    val nulls =
      """{"database":"deal_test","table":"deals","type":"insert","ts":1,
        |"data":{"id":9,"entity_name":null}}""".stripMargin.replace("\n", "")
    val after = RowDecoder.changeEvents(parse(nulls), dealsSpec).collect()(0)
      .getAs[org.apache.spark.sql.Row]("after")
    assert(after.getAs[Long]("id") == 9L)
    assert(after.isNullAt(after.fieldIndex("name")))
    assert(after.isNullAt(after.fieldIndex("score")))
  }

  test("registry: topic naming parity and duplicate rejection") {
    val reg = TableRegistry().register(dealsSpec)
    assert(dealsSpec.topic("tidb0") == "tidb0.deal_test.deals")
    assert(reg.get("deal_test", "deals").contains(dealsSpec))
    intercept[IllegalArgumentException] { reg.register(dealsSpec) }
  }

  test("schema evolution: unknown payload keys ignored, new columns NULL") {
    // forward compat: producer added a column the consumer doesn't know
    val extra = insertJson.replace("\"score\":3.5",
      "\"score\":3.5,\"brand_new_col\":\"surprise\"")
    val ev = RowDecoder.changeEvents(parse(extra), dealsSpec).collect()(0)
    assert(ev.getAs[org.apache.spark.sql.Row]("after")
      .getAs[Double]("score") == 3.5)
    // backward compat: consumer declared a column old events lack
    import org.apache.spark.sql.types._
    val widened = dealsSpec.copy(schema = StructType(
      dealsSpec.schema.fields :+ StructField("added_later", StringType)))
    val ev2 = RowDecoder.changeEvents(parse(insertJson), widened).collect()(0)
    val after2 = ev2.getAs[org.apache.spark.sql.Row]("after")
    assert(after2.isNullAt(after2.fieldIndex("added_later")))
    assert(after2.getAs[String]("name") == "widget A")
  }

  test("case-class registration derives the schema (reflect.TypeOf parity)") {
    val spec = TableSpec.fromCaseClass[CdcSpec.Deal](
      "deal_test", "deals", primaryKey = Seq("id"),
      renames = Map("entity_name" -> "name"))
    assert(spec.schema.fieldNames.toSeq ==
      Seq("id", "name", "entity_type", "active", "score"))
    val ev = RowDecoder.changeEvents(parse(insertJson), spec).collect()(0)
    val after = ev.getAs[org.apache.spark.sql.Row]("after")
    assert(after.getAs[Long]("id") == 7L)
    assert(after.getAs[String]("name") == "widget A")
    assert(after.getAs[Double]("score") == 3.5)
  }

  test("R10: embedded case-class base flattens to flat columns (gorm Model shape)") {
    val spec = TableSpec.fromCaseClass[CdcSpec.DealWithBase](
      "deal_test", "deals", primaryKey = Seq("id"),
      renames = Map("entity_name" -> "name"))
    // base's fields surface as top-level columns, in declaration order
    assert(spec.schema.fieldNames.toSeq ==
      Seq("id", "created_at", "name", "entity_type", "active", "score"))
    // and the golden fixture decodes straight into the flat columns
    val ev = RowDecoder.changeEvents(parse(insertJson), spec).collect()(0)
    val after = ev.getAs[org.apache.spark.sql.Row]("after")
    assert(after.getAs[Long]("id") == 7L)
    assert(after.getAs[java.sql.Timestamp]("created_at") != null)
    assert(after.getAs[String]("name") == "widget A")
    assert(after.getAs[Boolean]("active"))
    // colliding names after flattening fail fast, not silently last-wins
    val e = intercept[IllegalArgumentException] {
      TableSpec.fromCaseClass[CdcSpec.Clash]("d", "t", Seq("id"))
    }
    assert(e.getMessage.contains("id"))
  }

  test("VARIANT decode path is value-identical to the from_json path") {
    val ms = insertJson.replace("\"created_at\":\"2022-02-14 15:03:37.423\"",
      "\"created_at\":1644822217423")
    val zero = insertJson.replace("\"active\":1", "\"active\":0")
    val nullOldU = updateJson.replace(
      """"old":{"entity_name":"widget A","score":3.5}""", """"old":{"score":null}""")
    val lines = Seq(insertJson, updateJson, deleteJson, ms, zero, nullOldU)
    def varParse(ls: Seq[String]) = {
      val ds = spark.createDataset(ls)(Encoders.STRING)
      Maxwell.parseEnvelopeVariantCol(ds.toDF("value"), col("value"))
    }
    for (strict <- Seq(false, true); backfill <- Seq(false, true)) {
      val classic = RowDecoder.changeEvents(parse(lines: _*), dealsSpec,
        strictParity = strict, backfillBefore = backfill)
      val variant = RowDecoder.changeEventsVariant(varParse(lines), dealsSpec,
        strictParity = strict, backfillBefore = backfill)
      assert(classic.schema == variant.schema,
        s"schema drift (strict=$strict backfill=$backfill)")
      // changed_cols order may differ between raw-text key order and the
      // variant's canonical key order — compare as sorted sets
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("changed_cols", sort_array(col("changed_cols")))
      assert(canon(classic).exceptAll(canon(variant)).count() == 0 &&
             canon(variant).exceptAll(canon(classic)).count() == 0,
        s"value drift (strict=$strict backfill=$backfill)")
    }
    // malformed lines are dropped identically
    val bad = Seq("not json at all", """{"database":"d"}""", insertJson)
    assert(RowDecoder.changeEvents(parse(bad: _*), dealsSpec).count() ==
           RowDecoder.changeEventsVariant(varParse(bad), dealsSpec).count())
  }

  test("exact path REJECTS updates whose `old` is missing or malformed JSON") {
    // a NULL changed_cols on an update must raise, not silently evaluate
    // as "nothing changed" (before := after — a wrong retraction)
    val malformed =
      """{"database":"deal_test","table":"deals","type":"update","ts":2,
        |"data":{"id":7,"entity_name":"g1","score":2.0},
        |"old":"{{{not json"}""".stripMargin.replace("\n", "")
    val events = RowDecoder.changeEvents(parse(malformed), dealsSpec)
    val e = intercept[Exception] {
      IncrementalAgg.sumCount(events, "name", "score").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("NULL changed_cols")),
      s"expected the NULL-changed_cols guard to fire, got: ${messages(e)}")
  }

  test("corrupt-record sidecar captures malformed lines") {
    val lines = spark.createDataset(Seq(
      insertJson, "{{{not json", """{"type": 7}"""))(Encoders.STRING)
    val parsed = Maxwell.parseEnvelopeWithCorrupt(lines)
    assert(parsed.count() == 3)
    val corrupt = parsed.filter(col("_corrupt_record").isNotNull)
    assert(corrupt.count() >= 1) // the unparseable line is preserved
    assert(corrupt.filter(col("_corrupt_record").contains("not json"))
      .count() == 1)
    val good = parsed.filter(col("_corrupt_record").isNull &&
                             col("type") === "insert")
    assert(good.count() == 1)
  }

  test("events for other tables are filtered out") {
    val other = insertJson.replace("\"table\":\"deals\"", "\"table\":\"other\"")
    assert(RowDecoder.changeEvents(parse(other), dealsSpec).count() == 0)
  }
}
