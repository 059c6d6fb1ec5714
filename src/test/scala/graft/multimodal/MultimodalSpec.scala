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
}
