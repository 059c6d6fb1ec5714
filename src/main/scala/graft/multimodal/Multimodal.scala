package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media payloads
  * travel as opaque `binary` columns with a typed metadata struct, and the
  * expensive per-item work (decode / feature-extract / resize / frame
  * sample) runs as partition-local batch functions.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration shape —
  * is real and tested. The actual codec call is STUBBED (this container
  * has no image/audio libraries): `fakeDecodeFeatures` derives
  * deterministic pseudo-features from the bytes so the pipeline shape is
  * verifiable end-to-end. In production the stub body is replaced by the
  * real codec (JNI/javacv), or the column is exported to a Python stage
  * (`mapInPandas`/`mapInArrow`) — the schema and batching contract here
  * are exactly what that stage consumes.
  *
  * Scale notes: binaries never participate in shuffles here — metadata
  * extraction and feature stubs are narrow maps; size bucketing uses the
  * LENGTH of the payload, not the payload. `repartitionForDecode` sizes
  * partitions by total payload bytes (not row count) so a 100 TB media
  * table decodes with even executor memory pressure.
  */
object Multimodal {

  /** Media row schema: id + modality + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),       // image | audio | video
    StructField("content", BinaryType),        // opaque payload
    StructField("meta", StructType(Seq(        // typed sidecar metadata
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),       // images/video
      StructField("height", IntegerType),
      StructField("duration_ms", LongType)))))) // audio/video

  /** Derive a deterministic media table from `documents` (the sandbox has
    * no real media): payload = utf8 bytes of the text, modality assigned
    * round-robin, metadata filled from payload length. This is test
    * scaffolding, not a data generator — every byte traces back to the
    * driver-provided table. */
  def syntheticMediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        (col("n_chars") * 100).as("duration_ms")).as("meta"))

  /** Size the decode-stage partition COUNT from total payload bytes, so
    * the AVERAGE task sees ~`targetBytesPerPartition`. Rows are hash-
    * distributed by id — balanced in expectation, but a single payload
    * far above the target still lands whole in one task (binary rows
    * can't be split). The full fix at scale is range-partitioning on
    * cumulative byte offset computed from metadata; this helper keeps the
    * common case cheap. */
  def repartitionForDecode(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val totalBytes = media.select(sum(length(col("content")))).head.getLong(0)
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    media.repartition(parts, col("media_id"))
  }

  /** The documented "full fix": BYTE-OFFSET RANGE partitioning for the
    * decode stage. Every row gets its global cumulative byte offset
    * (computed from `meta.n_bytes` — the payload itself is never read
    * for planning) and is bucketed by `offset / targetBytesPerPartition`,
    * so each decode task sees ~target bytes REGARDLESS of the size
    * distribution: a single 100× outlier payload starts a fresh bucket
    * range and subsequent rows spill into LATER buckets instead of
    * piling onto its task (hash distribution would co-locate them with
    * probability 1/parts each).
    *
    * Distributed prefix sum, no global window (a partition-less
    * `orderBy().rowsBetween` would funnel the table through ONE
    * partition): per-SOURCE-partition running sums in parallel windows
    * (any consistent total order balances — (source partition, id) is
    * one), per-partition TOTALS (numPartitions rows, the only driver
    * materialization) folded into base offsets, then a range shuffle on
    * the bucket id. The binaries move through two exchanges (the window
    * clustering + the final bucket range); planning reads only
    * metadata. */
  def repartitionForDecodeBalanced(media: DataFrame,
                                   targetBytesPerPartition: Long): DataFrame = {
    val ranged = media.withColumn("__p", spark_partition_id())
    // parallel per-source-partition running sum (window partitions = the
    // source partitions, so no single-partition funnel)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__p")).orderBy(col("media_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    val withLocal = ranged.withColumn("__local_end",
      sum(col("meta.n_bytes")).over(w))
    // per-partition totals -> driver fold into exclusive base offsets
    // (numPartitions rows — same driver-bounded pattern as
    // q_select_budget's prefix fold)
    val totals = withLocal.groupBy(col("__p"))
      .agg(max(col("__local_end")).as("__total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft(0 -> 0L) {
      case ((_, acc), (p, t)) => p -> (acc + t)
    }.init.map { case (_, base) => base } // base(p) = sum of totals < p
    // base offsets ride a BROADCAST join keyed by the partition id — a
    // when-chain expression would balloon (and choke codegen) at the
    // 100k+ source partitions a 100 TB media table has
    val spark = media.sparkSession
    val baseDf = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        totals.map(_._1).zip(bases).map { case (p, b) =>
          org.apache.spark.sql.Row(p, b)
        }.toSeq).asJava,
      StructType(Seq(StructField("__p", IntegerType, nullable = false),
                     StructField("__base", LongType, nullable = false))))
    val nBuckets = math.max(1,
      ((totals.map(_._2).sum + targetBytesPerPartition - 1) /
        targetBytesPerPartition).toInt)
    withLocal
      .join(broadcast(baseDf), Seq("__p"))
      .withColumn("__bucket",
        ((col("__base") + col("__local_end") - col("meta.n_bytes")) /
          targetBytesPerPartition).cast("int"))
      // range (not hash) on the bucket id: distinct consecutive ints map
      // ~1:1 onto tasks, so two full buckets never collide into one task
      .repartitionByRange(nBuckets, col("__bucket"))
      .drop("__p", "__local_end", "__bucket", "__base")
  }

  /** ======== STUB: replace with a real codec in production ========
    * Deterministic pseudo-decode: 8 "features" from byte statistics.
    * Runs partition-local over an iterator — the exact shape a real
    * decoder (or an Arrow-batched Python UDF stage) plugs into. */
  def fakeDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0.0f)
    var sum = 0L; var min = 255; var max = 0; var alt = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      sum += b; if (b < min) min = b; if (b > max) max = b
      alt += (if (i % 2 == 0) b else -b)
      i += 1
    }
    val n = bytes.length.toFloat
    Array(n, sum / n, min.toFloat, max.toFloat, alt / n,
          bytes(0) & 0xFF, bytes(bytes.length - 1) & 0xFF,
          (sum % 251).toFloat)
  }

  /** Feature extraction over the media table: mapPartitions keeps the
    * decode batched per task (amortizing any codec init cost) and returns
    * (media_id, features array) — binaries are dropped before any
    * downstream shuffle. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handles, model weights)
        rows.map { case (id, bytes) => (id, fakeDecodeFeatures(bytes)) }
      }
      .toDF("media_id", "features")
  }

  /** "Resize": deterministic payload truncation standing in for a pixel
    * resize — demonstrates binary-in/binary-out transforms staying
    * partition-local. */
  def resizePayload(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("content",
      when(length(col("content")) > maxBytes,
           substring(col("content"), 1, maxBytes))
        .otherwise(col("content")))
      .withColumn("meta", col("meta").withField("n_bytes",
        least(col("meta.n_bytes"), lit(maxBytes.toLong))))

  /** "Frame sampling": cut the payload into fixed-size frames and keep
    * every k-th — the video-pipeline shape (explode is the only row
    * multiplier, bounded by frames/k per item). */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame =
    media
      .withColumn("n_frames",
        ceil(length(col("content")).cast("double") / frameBytes).cast("int"))
      // empty/NULL payloads have no frames; without this, sequence(0, -1)
      // would emit a DESCENDING [0, -1] and produce phantom frame rows
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1),
                       i => i % everyK === 0)))
      .select(col("media_id"), col("frame_idx"),
              substring_index_bytes(col("content"),
                col("frame_idx") * frameBytes, frameBytes).as("frame"))

  // substring over binary with column offsets (substring() needs literals)
  private def substring_index_bytes(content: org.apache.spark.sql.Column,
                                    start: org.apache.spark.sql.Column,
                                    len: Int): org.apache.spark.sql.Column =
    call_function("substring", content, start + 1, lit(len))
}
