package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Maxwell changelog synthesis from the `orders` testdata
  * table — the sandbox stand-in for a TiCDC->Kafka topic (the reference's
  * golden fixture `test/fff.json` was captured the same way: a probe dumping
  * real topic messages, `/root/reference/test/ko.go:64-75`).
  *
  * Event plan (chosen so the materialized state has a closed-form SQL
  * oracle over `orders` itself):
  *   - INSERT for every order           at ts = epoch(o_orderdate)
  *   - UPDATE for o_orderstatus = 'F'   at ts+3600, o_totalprice *= 1.1,
  *                                      `old` carries only the changed col
  *                                      (real Maxwell partial-old shape)
  *   - DELETE for o_orderkey % 10 == 0  at ts+7200, full row image in data
  *
  * Expected state = orders where key%10 != 0, totalprice*1.1 for 'F'.
  */
object ChangelogGen {

  val Database = "graft_demo"
  val Table = "orders"

  import org.apache.spark.sql.types._

  val ordersSpec: TableSpec = TableSpec(
    database = Database,
    table = Table,
    primaryKey = Seq("o_orderkey"),
    schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))))

  /** Memo of generated changelogs per (session, sfDir): the synthetic log
    * stands in for a Kafka topic — it exists once, it isn't re-produced
    * per query. Caching the JSON lines (pre-parse) keeps every downstream
    * engine stage (envelope parse, decode, materialize) honestly measured
    * while not re-billing the generator to each CDC query. */
  private val logCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** The Maxwell envelope serializer every synthetic topic shares —
    * one place owns the wire shape (database/table/type/ts/data[/old]),
    * so a protocol change edits one function, not one per topic. */
  private def envelopeCol(table: org.apache.spark.sql.Column)
                         (typ: String, ts: org.apache.spark.sql.Column,
                          data: org.apache.spark.sql.Column,
                          old: Option[org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    val fields = Seq(
      lit(Database).as("database"), table.as("table"),
      lit(typ).as("type"), ts.as("ts"), data.as("data")) ++
      old.map(_.as("old")).toSeq
    to_json(struct(fields: _*))
  }
  private def envelopeCol(table: String)
      : (String, org.apache.spark.sql.Column, org.apache.spark.sql.Column,
         Option[org.apache.spark.sql.Column]) => org.apache.spark.sql.Column =
    envelopeCol(lit(table)) _

  def ordersChangelog(spark: SparkSession, sfDir: String): DataFrame =
    logCache.computeIfAbsent((spark, sfDir),
      _ => buildOrdersChangelog(spark, sfDir).cache())

  /** Maxwell JSON lines for the synthetic orders changelog, with a `seq`
    * column for deterministic same-ts ordering. Everything is expression-
    * level (to_json over structs) — no collect, no UDFs: generation itself
    * scales like any narrow map over the source table. */
  private def buildOrdersChangelog(spark: SparkSession, sfDir: String): DataFrame = {
    // the source file is a single small parquet (1 partition); the JSON
    // synthesis + downstream parse is CPU-bound, so spread it first
    val orders = graft.Tables.ensureParallelism(
      graft.Tables.load(spark, sfDir, "orders"))
    val base = unix_timestamp(col("o_orderdate"))
    val rowImage = struct(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))

    val envelope = envelopeCol(Table)

    val inserts = orders.select(
      envelope("insert", base, rowImage, None).as("value"),
      (col("o_orderkey") * 3).as("seq"))

    val updated = rowImage.withField("o_totalprice", col("o_totalprice") * 1.1)
    val updates = orders.filter(col("o_orderstatus") === "F").select(
      envelope("update", base + 3600, updated,
        Some(struct(col("o_totalprice")))).as("value"),
      (col("o_orderkey") * 3 + 1).as("seq"))

    val deleted = when(col("o_orderstatus") === "F",
        updated).otherwise(rowImage)
    val deletes = orders.filter(col("o_orderkey") % 10 === 0).select(
      envelope("delete", base + 7200, deleted, None).as("value"),
      (col("o_orderkey") * 3 + 2).as("seq"))

    inserts.unionByName(updates).unionByName(deletes)
  }

  /** Parsed-envelope memo (same rationale as the log memo: the parsed
    * topic is shared input to every CDC query in a session; the per-query
    * cost under measurement is decode -> route -> materialize). */
  private val envCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Envelope parse, carrying the generator's seq column through.
    * (from_json path: measured faster than the VARIANT alternative on
    * this narrow 6-field envelope — see Maxwell.parseEnvelopeVariantCol's
    * scaladoc for when each wins.) */
  def ordersEnvelope(spark: SparkSession, sfDir: String): DataFrame =
    envCache.computeIfAbsent((spark, sfDir), _ => {
      val log = ordersChangelog(spark, sfDir)
      log.select(
          from_json(col("value"), Maxwell.envelopeSchema).as("e"), col("seq"))
        .select(col("e.*"), col("seq"))
        .cache()
    })

  /** Unpersist and drop all memoized changelogs/envelopes for a session
    * (all scale factors) — the release hook the memo otherwise lacks;
    * long-lived sessions that iterate over many sfDirs call this between
    * them instead of accumulating cached generations.
    *
    * TEARDOWN-ONLY contract: the pinned decoded-changelog memos are
    * shared (Materializer.pinnedEvents reuses them as-is across every
    * replay family), and a checkpointed RDD cannot recompute once its
    * blocks are dropped — calling this while ANY replay or query over
    * the session is still in flight breaks every consuming family at
    * once. Call it only between corpora / at session end, with no live
    * consumers. */
  def clearCache(spark: SparkSession): Unit = {
    def drain(m: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]): Unit = {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 eq spark) {
          e.getValue.unpersist()
          // checkpointed memos pin RDD blocks, not the plan cache
          org.apache.spark.sql.graft.bridge.unpersistPinned(e.getValue)
          it.remove()
        }
      }
    }
    drain(envCache)
    drain(logCache)
  }

  /** Full pipeline: synthesize -> parse envelope -> typed change events.
    * The default (non-strict) decode is memoized as a pinned checkpoint
    * like every other topic's — it feeds FIVE shared replay families
    * (join views, table views, snowflake, scd2 history, and the bench's
    * incremental-agg states), each of which would otherwise re-run the
    * typed decode over the cached envelope. The strict-parity variant
    * stays un-memoized: it is a spec/demo surface, not a replay input. */
  def ordersChangeEvents(spark: SparkSession, sfDir: String,
                         strictParity: Boolean = false): DataFrame =
    if (strictParity)
      RowDecoder.changeEvents(ordersEnvelope(spark, sfDir), ordersSpec,
                              strictParity = true)
    else {
      // resolve the envelope memo BEFORE entering this map's
      // computeIfAbsent: both entries live in envCache, and a nested
      // computeIfAbsent on the same ConcurrentHashMap throws
      // "Recursive update" whenever the two keys land in the same bin
      // — which depends on identity hashes, so it surfaced as a flaky
      // cold-start crash (PinnedBoundProbe), not a deterministic one
      val env = ordersEnvelope(spark, sfDir)
      envCache.computeIfAbsent((spark, s"orders-ev:$sfDir"), _ =>
        RowDecoder.changeEvents(env, ordersSpec).localCheckpoint(false))
    }

  /** Materialized current state of the synthetic changelog. */
  def ordersState(spark: SparkSession, sfDir: String): DataFrame =
    Materializer.currentState(
      ordersChangeEvents(spark, sfDir), ordersSpec.primaryKey)

  // ---------- customer changelog (second topic, for join views) ----------

  val customerSpec: TableSpec = TableSpec(
    database = Database,
    table = "customer",
    primaryKey = Seq("c_custkey"),
    schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType))))

  /** Deterministic customer changelog — the SECOND topic, so that join
    * views have two independently-evolving sides. Event plan (closed-form
    * final state: custkey % 25 != 0 survives, acctbal +100 when
    * custkey % 4 == 0):
    *   - INSERT every customer at ts = 757382400 + (custkey % 3) * 5e7 —
    *     the stagger lands inserts in all three replay windows used by
    *     `cdc_join_view`, so dimension rows ARRIVE LATE relative to the
    *     orders that reference them (the hard case for view maintenance)
    *   - UPDATE c_acctbal += 100 for custkey % 4 == 0 at ts+3600
    *     (`old` carries only the changed column)
    *   - DELETE custkey % 25 == 0 at ts+7200 (full row image) */
  def customerChangelog(spark: SparkSession, sfDir: String): DataFrame =
    logCache.computeIfAbsent((spark, s"customer:$sfDir"),
      _ => buildCustomerChangelog(spark, sfDir).cache())

  private def buildCustomerChangelog(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = graft.Tables.ensureParallelism(
        graft.Tables.load(spark, sfDir, "customer"))
      .select(col("c_custkey"), col("c_name"),
              col("c_nationkey"), col("c_acctbal"))
    val base = lit(757382400L) + (col("c_custkey") % 3) * 50000000L
    val rowImage = struct(col("c_custkey"), col("c_name"),
                          col("c_nationkey"), col("c_acctbal"))
    val envelope = envelopeCol("customer")
    val inserts = cust.select(
      envelope("insert", base, rowImage, None).as("value"),
      (col("c_custkey") * 3).as("seq"))
    val updated = rowImage.withField("c_acctbal", col("c_acctbal") + 100.0)
    val updates = cust.filter(col("c_custkey") % 4 === 0).select(
      envelope("update", base + 3600, updated,
        Some(struct(col("c_acctbal")))).as("value"),
      (col("c_custkey") * 3 + 1).as("seq"))
    val deleted = when(col("c_custkey") % 4 === 0, updated).otherwise(rowImage)
    val deletes = cust.filter(col("c_custkey") % 25 === 0).select(
      envelope("delete", base + 7200, deleted, None).as("value"),
      (col("c_custkey") * 3 + 2).as("seq"))
    inserts.unionByName(updates).unionByName(deletes)
  }

  def customerChangeEvents(spark: SparkSession, sfDir: String): DataFrame =
    envCache.computeIfAbsent((spark, s"customer:$sfDir"), _ => {
      val log = customerChangelog(spark, sfDir)
      RowDecoder.changeEvents(
        log.select(
            from_json(col("value"), Maxwell.envelopeSchema).as("e"),
            col("seq"))
          .select(col("e.*"), col("seq")),
        customerSpec).localCheckpoint(false)
    })

  /** Materialized current state of the customer changelog. */
  def customerState(spark: SparkSession, sfDir: String): DataFrame =
    Materializer.currentState(
      customerChangeEvents(spark, sfDir), customerSpec.primaryKey)

  // ---------- lineitem changelog (third topic: the snowflake fact) ----------

  val lineitemSpec: TableSpec = TableSpec(
    database = Database,
    table = "lineitem",
    primaryKey = Seq("l_orderkey", "l_linenumber"),
    schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_returnflag", StringType))))

  /** Deterministic lineitem changelog — the THIRD topic, the fact of the
    * snowflake chain lineitem→orders→customer, with a COMPOSITE primary
    * key. Event plan (closed-form final state: l_orderkey % 7 != 0
    * survives, extendedprice * 0.95 when l_linenumber is even):
    *   - INSERT every lineitem at ts = epoch(l_shipdate) — ship dates
    *     span 1992-1998, so events land in every replay window and facts
    *     arrive both BEFORE and AFTER the dimension rows they reference
    *   - UPDATE l_extendedprice *= 0.95 for even l_linenumber at ts+3600
    *     (`old` carries only the changed column)
    *   - DELETE l_orderkey % 7 == 0 at ts+7200 (full row image) */
  def lineitemChangelog(spark: SparkSession, sfDir: String): DataFrame =
    logCache.computeIfAbsent((spark, s"lineitem:$sfDir"),
      _ => buildLineitemChangelog(spark, sfDir).cache())

  private def buildLineitemChangelog(spark: SparkSession, sfDir: String): DataFrame = {
    // the synthetic lineitem is NOT unique on (l_orderkey, l_linenumber)
    // — a changelog keyed on it would collapse duplicate keys by
    // last-writer-wins with NONDETERMINISTIC ties (identical ts + seq).
    // Dedup deterministically first: one row per pk, smallest by the
    // carried columns (total order; fully-identical dups pick an
    // identical row), mirrored verbatim in the DuckDB oracle.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_extendedprice"), col("l_discount"),
               col("l_returnflag"), col("l_shipdate"))
    val li = graft.Tables.ensureParallelism(
        graft.Tables.load(spark, sfDir, "lineitem"))
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice"), col("l_discount"),
              col("l_returnflag"), col("l_shipdate"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val base = unix_timestamp(col("l_shipdate"))
    // l_linenumber is 1..7, so orderkey*8 + linenumber is injective
    val rowId = col("l_orderkey") * 8 + col("l_linenumber")
    val rowImage = struct(col("l_orderkey"), col("l_linenumber"),
                          col("l_extendedprice"), col("l_discount"),
                          col("l_returnflag"))
    val envelope = envelopeCol("lineitem")
    val inserts = li.select(
      envelope("insert", base, rowImage, None).as("value"),
      (rowId * 3).as("seq"))
    val updated = rowImage.withField("l_extendedprice",
                                     col("l_extendedprice") * 0.95)
    val updates = li.filter(col("l_linenumber") % 2 === 0).select(
      envelope("update", base + 3600, updated,
        Some(struct(col("l_extendedprice")))).as("value"),
      (rowId * 3 + 1).as("seq"))
    val deleted = when(col("l_linenumber") % 2 === 0, updated)
      .otherwise(rowImage)
    val deletes = li.filter(col("l_orderkey") % 7 === 0).select(
      envelope("delete", base + 7200, deleted, None).as("value"),
      (rowId * 3 + 2).as("seq"))
    inserts.unionByName(updates).unionByName(deletes)
  }

  def lineitemChangeEvents(spark: SparkSession, sfDir: String): DataFrame =
    envCache.computeIfAbsent((spark, s"lineitem:$sfDir"), _ => {
      val log = lineitemChangelog(spark, sfDir)
      RowDecoder.changeEvents(
        log.select(
            from_json(col("value"), Maxwell.envelopeSchema).as("e"),
            col("seq"))
          .select(col("e.*"), col("seq")),
        lineitemSpec).localCheckpoint(false)
    })

  // ---------- documents changelog (the corpus topic) ----------

  val documentsSpec: TableSpec = TableSpec(
    database = Database,
    table = "documents",
    primaryKey = Seq("doc_id"),
    schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))))

  /** Event-plan phase boundaries for the documents changelog — replay
    * cuts at these timestamps split it into all-inserts / all-updates /
    * all-deletes batches (per-doc ts offsets keep each phase internally
    * ordered for any corpus under 10M docs). */
  val DocT1 = 1505000000L
  val DocT2 = 1515000000L

  /** Deterministic Maxwell changelog over the `documents` corpus — the
    * topic behind the INCREMENTAL dedup-index family. Event plan (chosen
    * so the final live corpus has a closed-form SQL oracle AND contains
    * planted exact duplicates):
    *   - INSERT every doc            at ts = 1.5e9 + doc_id
    *   - UPDATE doc_id % 7 == 0      at ts = 1.51e9 + doc_id: the doc's
    *     text/n_chars are REPLACED with doc_id+1's (when that doc
    *     exists), planting an exact-duplicate pair — the shape of a
    *     re-crawl picking up a mirrored page; `old` carries the two
    *     changed columns (Maxwell partial-old)
    *   - DELETE doc_id % 10 == 0     at ts = 1.52e9 + doc_id, full image
    *
    * Live state = docs with doc_id % 10 != 0, text/n_chars swapped to
    * the successor doc's for doc_id % 7 == 0. */
  def documentsChangelog(spark: SparkSession, sfDir: String): DataFrame =
    logCache.computeIfAbsent((spark, s"documents:$sfDir"),
      _ => buildDocumentsChangelog(spark, sfDir).cache())

  private def buildDocumentsChangelog(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.ensureParallelism(
        graft.Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
              col("n_chars"))
    // donor row for the update phase: doc_id + 1's text (broadcast-safe
    // equi self-join; missing donor -> keep own text, mirrored in SQL)
    val donor = docs.select((col("doc_id") - 1).as("doc_id"),
                            col("text").as("__donor_text"),
                            col("n_chars").as("__donor_n"))
    val joined = docs.join(donor, Seq("doc_id"), "left")
    val rowImage = struct(col("doc_id"), col("text"), col("lang"),
                          col("source"), col("n_chars"))
    val envelope = envelopeCol("documents")
    val inserts = joined.select(
      envelope("insert", lit(1500000000L) + col("doc_id"), rowImage,
               None).as("value"),
      (col("doc_id") * 3).as("seq"))
    val updated = rowImage
      .withField("text", coalesce(col("__donor_text"), col("text")))
      .withField("n_chars", coalesce(col("__donor_n"), col("n_chars")))
    val updates = joined.filter(col("doc_id") % 7 === 0).select(
      envelope("update", lit(1510000000L) + col("doc_id"), updated,
        Some(struct(col("text"), col("n_chars")))).as("value"),
      (col("doc_id") * 3 + 1).as("seq"))
    val deleted = when(col("doc_id") % 7 === 0, updated).otherwise(rowImage)
    val deletes = joined.filter(col("doc_id") % 10 === 0).select(
      envelope("delete", lit(1520000000L) + col("doc_id"), deleted,
               None).as("value"),
      (col("doc_id") * 3 + 2).as("seq"))
    inserts.unionByName(updates).unionByName(deletes)
  }

  def documentsChangeEvents(spark: SparkSession, sfDir: String): DataFrame =
    envCache.computeIfAbsent((spark, s"documents:$sfDir"), _ => {
      val log = documentsChangelog(spark, sfDir)
      RowDecoder.changeEvents(
        log.select(
            from_json(col("value"), Maxwell.envelopeSchema).as("e"),
            col("seq"))
          .select(col("e.*"), col("seq")),
        documentsSpec).localCheckpoint(false)
    })

  // ---------- benchmarks changelog (the eval-suite topic) ----------

  val benchmarksSpec: TableSpec = TableSpec(
    database = Database,
    table = "benchmarks",
    primaryKey = Seq("b_id"),
    schema = StructType(Seq(
      StructField("b_id", LongType),
      StructField("suite", StringType),
      StructField("text", StringType))))

  /** Deterministic Maxwell changelog over a synthetic BENCHMARK table —
    * the second topic of the maintained decontamination view
    * ([[graft.dedup.DecontamView]]). Benchmark entries are token
    * excerpts of BASE document texts (so natural train/eval overlap
    * exists by construction), and the event plan exercises the three
    * decontamination lifecycles a living eval registry has:
    *   - suite_a INSERTs           at ts = 1.5e9  + b_id: one entry per
    *     doc_id % 17 == 0 donor (b_id = doc_id/17), text = the donor's
    *     first 12 tokens
    *   - suite_b INSERTs (a NEW EVAL RELEASE, arriving after the corpus
    *     is indexed) at ts = 1.51e9 + j: one entry per
    *     doc_id = 23j + 5 donor (b_id = 100000 + j), text = donor
    *     tokens 5..16 — UNCHANGED corpus docs must gain contamination
    *     flags through the maintained gram index, not a corpus rescan
    *   - suite_a UPDATEs (revision) at ts = 1.512e9 + b_id for
    *     b_id % 5 == 3: text re-excerpted from the donor's successor doc
    *     (missing successor -> keep own, mirrored in SQL); `old`
    *     carries the replaced text (Maxwell partial-old)
    *   - DELETEs (eval retired)    at ts = 1.52e9 + b_id % 100000 for
    *     b_id % 4 == 0 in both suites — retiring an eval must RETRACT
    *     its contamination flags from otherwise-untouched docs
    * Phases align with [[DocT1]]/[[DocT2]], so the decontam replay's
    * cuts split both topics into the same three windows. */
  def benchChangelog(spark: SparkSession, sfDir: String): DataFrame =
    logCache.computeIfAbsent((spark, s"benchmarks:$sfDir"),
      _ => buildBenchChangelog(spark, sfDir).cache())

  private def buildBenchChangelog(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.ensureParallelism(
        graft.Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"),
              graft.text.TextAnalysis.tokens(col("text")).as("toks"))
    def excerpt(toks: org.apache.spark.sql.Column, from: Int, n: Int) =
      concat_ws(" ", slice(toks, from, n))
    val envelope = envelopeCol("benchmarks")
    // suite_a: donors doc_id % 17 == 0; successor donor for the revision
    val next = docs.select((col("doc_id") - 1).as("doc_id"),
                           col("toks").as("__next_toks"))
    val a = docs.filter(col("doc_id") % 17 === 0)
      .join(next, Seq("doc_id"), "left")
      .select(expr("doc_id div 17").as("b_id"), col("toks"),
              col("__next_toks"))
    val aImage = struct(col("b_id"), lit("suite_a").as("suite"),
                        excerpt(col("toks"), 1, 12).as("text"))
    val aRevised = aImage.withField("text",
      excerpt(coalesce(col("__next_toks"), col("toks")), 1, 12))
    val aInserts = a.select(
      envelope("insert", lit(1500000000L) + col("b_id"), aImage,
               None).as("value"),
      (col("b_id") * 3).as("seq"))
    val aUpdates = a.filter(col("b_id") % 5 === 3).select(
      envelope("update", lit(1512000000L) + col("b_id"), aRevised,
        Some(struct(excerpt(col("toks"), 1, 12).as("text")))).as("value"),
      (col("b_id") * 3 + 1).as("seq"))
    // suite_b: donors doc_id = 23j + 5 — the post-index release. Its
    // key space is partitioned STRUCTURALLY from suite_a's (b_id =
    // doc_id/17): a 10^9 base keeps the ranges disjoint up to 1.7e10
    // donor docs, where an additive offset sized to a small sf would
    // collide once doc_id/17 crossed it — two registry entries sharing
    // a pk silently merge in the replay (last-writer-wins corruption).
    val suiteBBase = 1000000000L
    val b = docs.filter(col("doc_id") >= 5 && (col("doc_id") - 5) % 23 === 0)
      .select((lit(suiteBBase) + expr("(doc_id - 5) div 23")).as("b_id"),
              col("toks"))
    val bImage = struct(col("b_id"), lit("suite_b").as("suite"),
                        excerpt(col("toks"), 5, 12).as("text"))
    val bInserts = b.select(
      envelope("insert", lit(1510000000L) + (col("b_id") - suiteBBase),
               bImage, None).as("value"),
      (col("b_id") * 3).as("seq"))
    // deletes: current image (suite_a % 5 == 3 rows carry the revision)
    val aDeletes = a.filter(col("b_id") % 4 === 0).select(
      envelope("delete", lit(1520000000L) + col("b_id"),
        when(col("b_id") % 5 === 3, aRevised).otherwise(aImage),
        None).as("value"),
      (col("b_id") * 3 + 2).as("seq"))
    val bDeletes = b.filter(col("b_id") % 4 === 0).select(
      envelope("delete", lit(1520000000L) + (col("b_id") - suiteBBase),
               bImage, None).as("value"),
      (col("b_id") * 3 + 2).as("seq"))
    aInserts.unionByName(aUpdates).unionByName(bInserts)
      .unionByName(aDeletes).unionByName(bDeletes)
  }

  def benchChangeEvents(spark: SparkSession, sfDir: String): DataFrame =
    envCache.computeIfAbsent((spark, s"benchmarks:$sfDir"), _ => {
      val log = benchChangelog(spark, sfDir)
      RowDecoder.changeEvents(
        log.select(
            from_json(col("value"), Maxwell.envelopeSchema).as("e"),
            col("seq"))
          .select(col("e.*"), col("seq")),
        benchmarksSpec).localCheckpoint(false)
    })

  // ---------- embeddings changelog (the vector-corpus topic) ----------

  val embeddingsSpec: TableSpec = TableSpec(
    database = Database,
    table = "embeddings",
    primaryKey = Seq("vec_id"),
    schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  /** Deterministic Maxwell changelog over the `embeddings` corpus — the
    * topic behind the incremental ANN index. Same phase plan and cut
    * boundaries ([[DocT1]]/[[DocT2]]) as the documents changelog:
    *   - INSERT every vector        at ts = 1.5e9 + vec_id
    *   - UPDATE vec_id % 7 == 0     at ts = 1.51e9 + vec_id: the vector
    *     is REPLACED with vec_id+1's (re-embedding after a content
    *     change; `old` carries the changed column)
    *   - DELETE vec_id % 10 == 0    at ts = 1.52e9 + vec_id
    *
    * The float array rides the JSON envelope as a JSON array; Spark's
    * shortest-roundtrip float formatting makes decode bit-exact, so the
    * maintained state's vectors equal the parquet originals. */
  def embeddingsChangelog(spark: SparkSession, sfDir: String): DataFrame =
    logCache.computeIfAbsent((spark, s"embeddings:$sfDir"),
      _ => buildEmbeddingsChangelog(spark, sfDir).cache())

  private def buildEmbeddingsChangelog(spark: SparkSession, sfDir: String): DataFrame = {
    val embs = graft.Tables.ensureParallelism(
        graft.Tables.load(spark, sfDir, "embeddings"))
      .select(col("vec_id"), col("embedding"), col("label"))
    val donor = embs.select((col("vec_id") - 1).as("vec_id"),
                            col("embedding").as("__donor_vec"))
    val joined = embs.join(donor, Seq("vec_id"), "left")
    val rowImage = struct(col("vec_id"), col("embedding"), col("label"))
    val envelope = envelopeCol("embeddings")
    val inserts = joined.select(
      envelope("insert", lit(1500000000L) + col("vec_id"), rowImage,
               None).as("value"),
      (col("vec_id") * 3).as("seq"))
    val updated = rowImage.withField("embedding",
      coalesce(col("__donor_vec"), col("embedding")))
    val updates = joined.filter(col("vec_id") % 7 === 0).select(
      envelope("update", lit(1510000000L) + col("vec_id"), updated,
        Some(struct(col("embedding")))).as("value"),
      (col("vec_id") * 3 + 1).as("seq"))
    val deleted = when(col("vec_id") % 7 === 0, updated).otherwise(rowImage)
    val deletes = joined.filter(col("vec_id") % 10 === 0).select(
      envelope("delete", lit(1520000000L) + col("vec_id"), deleted,
               None).as("value"),
      (col("vec_id") * 3 + 2).as("seq"))
    inserts.unionByName(updates).unionByName(deletes)
  }

  def embeddingsChangeEvents(spark: SparkSession, sfDir: String): DataFrame =
    envCache.computeIfAbsent((spark, s"embeddings:$sfDir"), _ => {
      val log = embeddingsChangelog(spark, sfDir)
      RowDecoder.changeEvents(
        log.select(
            from_json(col("value"), Maxwell.envelopeSchema).as("e"),
            col("seq"))
          .select(col("e.*"), col("seq")),
        embeddingsSpec).localCheckpoint(false)
    })

  // ---------- events changelog (the behavioral-stream topic) ----------

  /** The event timestamp travels as EPOCH MICROS (`ts_us`, BIGINT) —
    * an event log's native wire form, and exact by construction: JSON
    * round-trips the integer bit-for-bit where a formatted timestamp
    * string depends on the serializer's fractional-second width
    * (`to_json`'s default truncates to millis). Consumers rebuild a
    * session-zoned timestamp with `timestamp_micros` where they need
    * one. */
  val eventsSpec: TableSpec = TableSpec(
    database = Database,
    table = "events",
    primaryKey = Seq("event_id"),
    schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts_us", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType))))

  /** Event-plan phase boundaries for the events changelog (same
    * three-phase plan as the documents topic). */
  val EvT1 = 1705000000L
  val EvT2 = 1715000000L

  /** Deterministic Maxwell changelog over the `events` stream table —
    * the topic behind the maintained SEQUENTIAL-PATTERN views
    * (sessions, funnel, transitions, sampling). Event plan (closed-form
    * live state, and perturbations that actually exercise sequential
    * semantics):
    *   - INSERT every event            at ts = 1.70e9 + event_id
    *   - UPDATE event_id % 7 == 0      at ts = 1.71e9 + event_id:
    *     event_type FLIPS ('click' -> 'view', anything else -> 'click')
    *     — moves the row across funnel steps and transition pairs;
    *     `old` carries only the changed column (Maxwell partial-old)
    *   - DELETE event_id % 10 == 0     at ts = 1.72e9 + event_id, full
    *     image — removing events merges/splits sessions and retracts
    *     funnel stages
    *
    * Live state = events with event_id % 10 != 0, event_type flipped
    * for event_id % 7 == 0. */
  def eventsChangelog(spark: SparkSession, sfDir: String): DataFrame =
    logCache.computeIfAbsent((spark, s"events:$sfDir"),
      _ => buildEventsChangelog(spark, sfDir).cache())

  private def buildEventsChangelog(spark: SparkSession, sfDir: String): DataFrame = {
    val events = graft.Tables.ensureParallelism(
        graft.Tables.load(spark, sfDir, "events"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
              col("user_id"), col("event_type"), col("value"))
    val rowImage = struct(col("event_id"), col("ts_us"), col("user_id"),
                          col("event_type"), col("value"))
    val envelope = envelopeCol("events")
    val inserts = events.select(
      envelope("insert", lit(1700000000L) + col("event_id"), rowImage,
               None).as("value"),
      (col("event_id") * 3).as("seq"))
    val flipped = when(col("event_type") === "click", lit("view"))
      .otherwise(lit("click"))
    val updated = rowImage.withField("event_type", flipped)
    val updates = events.filter(col("event_id") % 7 === 0).select(
      envelope("update", lit(1710000000L) + col("event_id"), updated,
        Some(struct(col("event_type")))).as("value"),
      (col("event_id") * 3 + 1).as("seq"))
    val deleted = when(col("event_id") % 7 === 0, updated).otherwise(rowImage)
    val deletes = events.filter(col("event_id") % 10 === 0).select(
      envelope("delete", lit(1720000000L) + col("event_id"), deleted,
               None).as("value"),
      (col("event_id") * 3 + 2).as("seq"))
    inserts.unionByName(updates).unionByName(deletes)
  }

  def eventsChangeEvents(spark: SparkSession, sfDir: String): DataFrame =
    envCache.computeIfAbsent((spark, s"events:$sfDir"), _ => {
      val log = eventsChangelog(spark, sfDir)
      RowDecoder.changeEvents(
        log.select(
            from_json(col("value"), Maxwell.envelopeSchema).as("e"),
            col("seq"))
          .select(col("e.*"), col("seq")),
        eventsSpec).localCheckpoint(false)
    })
}
