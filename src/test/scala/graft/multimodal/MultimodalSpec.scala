package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, deterministic stub decode, resize, frame
  * sampling, byte-balanced partitioning. */
class MultimodalSpec extends SparkSpec {

  lazy val docs = graft.Tables.load(spark, sfDir, "documents")
  lazy val media = Multimodal.syntheticMediaFromDocuments(docs).cache()

  private def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
    s.fields.map(f => f.name -> f.dataType.sql.replace(" NOT NULL", "")).toSeq

  test("media table matches the declared schema (names+types)") {
    assert(shape(media.schema) == shape(Multimodal.mediaSchema))
    assert(media.count() == docs.count())
    assert(media.filter(col("content").isNull).count() == 0)
    assert(media.select("modality").distinct().count() == 3)
    // metadata consistent with payload
    assert(media.filter(col("meta.n_bytes") =!= length(col("content")))
      .count() == 0)
  }

  test("feature extraction is deterministic and binary-free downstream") {
    val f1 = Multimodal.extractFeatures(spark, media)
    val f2 = Multimodal.extractFeatures(spark, media)
    assert(f1.schema.fieldNames.toSeq == Seq("media_id", "features"))
    assert(f1.count() == media.count())
    assert(f1.exceptAll(f2).count() == 0) // deterministic
    val row = f1.filter(col("media_id") === 0).head()
    val feats = row.getSeq[Float](row.fieldIndex("features"))
    assert(feats.length == 8 && feats.head > 0) // n_bytes feature
  }

  test("stub decode matches a direct invocation on the same bytes") {
    val bytes = "hello world".getBytes("UTF-8")
    val direct = Multimodal.fakeDecodeFeatures(bytes).toSeq
    val viaRow = Multimodal.extractFeatures(spark,
        media.filter(col("media_id") === 0)).head()
    val viaDf = viaRow.getSeq[Float](viaRow.fieldIndex("features"))
    val expected = Multimodal.fakeDecodeFeatures(
      docs.filter(col("doc_id") === 0).head().getAs[String]("text")
        .getBytes("UTF-8")).toSeq
    assert(viaDf.toSeq == expected)
    assert(direct.length == 8)
  }

  test("resize truncates payload and clamps metadata") {
    val resized = Multimodal.resizePayload(media, maxBytes = 100)
    assert(resized.filter(length(col("content")) > 100).count() == 0)
    assert(resized.filter(col("meta.n_bytes") > 100).count() == 0)
    // short payloads untouched
    val shortOnes = media.filter(length(col("content")) <= 100).count()
    val untouched = resized.join(media.select(col("media_id"),
        col("content").as("orig")), "media_id")
      .filter(col("content") === col("orig")).count()
    assert(untouched == shortOnes)
  }

  test("frame sampling keeps every k-th fixed-size frame") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 50, everyK = 2)
    assert(frames.count() > 0)
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    assert(frames.filter(length(col("frame")) > 50).count() == 0)
    // doc 0: n_frames = ceil(len/50); sampled = ceil(n_frames/2)
    val len0 = media.filter(col("media_id") === 0)
      .select(length(col("content"))).head().getInt(0)
    val expect0 = (math.ceil(len0 / 50.0).toInt + 1) / 2
    assert(frames.filter(col("media_id") === 0).count() == expect0)
  }

  test("media features feed similarity search end-to-end") {
    // decode-stub features -> cosine ANN: the full multimodal pipeline
    // shape (binary in, ranked neighbors out) with everything but the
    // codec real
    val feats = Multimodal.extractFeatures(spark, media)
      .select(col("media_id").as("vec_id"),
              col("features").as("embedding"))
    val queries = feats.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val topk = graft.similarity.Similarity
      .bruteForceTopK(feats, queries, k = 5)
    assert(topk.count() == 15)
    assert(topk.filter(col("cos").isNull).count() == 0)
    assert(topk.filter(col("q_id") === col("neighbor_id")).count() == 0)
  }

  test("byte-balanced repartitioning yields the requested granularity") {
    val parts = Multimodal.repartitionForDecode(media, 10000L)
      .rdd.getNumPartitions
    val total = media.select(sum(length(col("content")))).head().getLong(0)
    assert(parts == math.max(1, (total / 10000L).toInt))
  }

  test("byte-OFFSET range partitioning isolates a planted 100x outlier") {
    val target = 20000L
    // plant one payload 100x the target: under hash distribution other
    // rows co-locate with it with probability 1/parts each; under
    // offset-range bucketing its bucket must stay (almost) exclusively
    // its own
    val outlierId = 999999L
    val outlier = spark.range(1).select(
      lit(outlierId).as("media_id"), lit("video").as("modality"),
      encode(repeat(lit("x"), (100 * target).toInt), "UTF-8").as("content"),
      struct(lit("application/octet-stream").as("mime"),
             lit(100 * target).as("n_bytes"),
             lit(1).as("width"), lit(1).as("height"),
             lit(0L).as("duration_ms")).as("meta"))
    val all = media.unionByName(outlier)
    val balanced = Multimodal.repartitionForDecodeBalanced(all, target)
    assert(balanced.count() == all.count(), "rows lost in repartition")
    assert(balanced.schema.fieldNames.toSeq ==
             media.schema.fieldNames.toSeq, "plan columns leaked")
    val stats = balanced
      .select(spark_partition_id().as("pid"),
              length(col("content")).cast("long").as("b"),
              (col("media_id") === outlierId).cast("int").as("is_outlier"))
      .groupBy(col("pid"))
      .agg(sum(col("b")).as("bytes"), max(col("is_outlier")).as("has_outlier"))
      .collect()
    val outlierParts = stats.filter(_.getInt(2) == 1)
    assert(outlierParts.length == 1)
    // no pile-on: everything else sharing the outlier's task fits in
    // one target window (its bucket spans [start, start+100*target) —
    // later rows start past it and land in LATER buckets)
    assert(outlierParts.head.getLong(1) - 100 * target <= target,
      s"outlier task carries ${outlierParts.head.getLong(1)} bytes")
    // spread: a non-outlier task holds rows whose START offsets share
    // one target window, so its bytes are < target + one max payload;
    // allow 2 windows for range-sampling boundary wobble
    val maxDoc = media.select(max(length(col("content")))).head().getInt(0)
    val bound = 2 * target + maxDoc
    val over = stats.filter(r => r.getInt(2) == 0 && r.getLong(1) > bound)
    assert(over.isEmpty,
      s"non-outlier task exceeds $bound bytes: ${over.mkString(",")}")
  }
}
