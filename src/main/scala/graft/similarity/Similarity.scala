package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Three tiers, by scale:
  *  - brute force: broadcast the (small) query set against the corpus —
  *    exact, O(|corpus|·|queries|·d), the baseline and the rerank kernel.
  *  - random-hyperplane LSH: P signed projections → P-bit bucket key;
  *    candidates = bucket collisions (multi-probe via hamming-1 neighbors
  *    optional). Corpus side is a scan + one shuffle on the bucket key.
  *  - IVF (inverted file): deterministic centroid subset, assign each
  *    vector to nearest centroid (broadcast centroids), queries probe the
  *    nprobe nearest lists. This is the 100 TB path: the corpus
  *    partitions by centroid id, so a query touches nprobe/C of the data.
  */
object Similarity {

  /** Exact top-k neighbors per query by cosine. Queries are broadcast —
    * the corpus never shuffles for the join; the only shuffle is the
    * per-query top-k (partitionBy qid over k·|corpus| rows, pre-pruned by
    * a per-partition filter when `preFilter` is set). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "q_id", queryVec: String = "q_vec",
                     excludeSelf: Boolean = true): DataFrame = {
    // norms hoisted per ROW (corpus-side once per vector, query-side
    // once per probe) so the enumerated probe×corpus filter evaluates
    // one dot kernel per pair instead of three — bit-identical
    // (VectorFunctions.cosineHoisted)
    val joined = corpus.withColumn("__cn", norm2(col(corpusVec)))
      .join(broadcast(queries.withColumn("__qn", norm2(col(queryVec)))),
        if (excludeSelf) col(corpusId) =!= col(queryId) else lit(true))
    val scored = joined.select(
      col(queryId), col(corpusId).as("neighbor_id"),
      cosineHoisted(col(queryVec), col(corpusVec),
                    col("__qn"), col("__cn")).as("cos"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Radius (threshold) search: every neighbor with cosine >= `minCos`.
    * Unlike top-k there is NO per-query shuffle at all — the probe set is
    * broadcast and the threshold filters scan-side, so the plan is a pure
    * narrow map over the corpus (the cheapest retrieval shape at 100 TB,
    * and the kernel behind dedup-by-similarity-threshold). Output size is
    * data-dependent; callers bound it by choosing `minCos`.
    *
    * `excludeSelf` filters on id EQUALITY, so it assumes probe ids live
    * in the corpus id space (probes drawn from the corpus, the typical
    * dedup shape). For externally-numbered probes pass
    * `excludeSelf = false`, or a corpus row whose id happens to equal a
    * probe id is silently dropped. */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, minCos: Double,
                  corpusId: String = "vec_id", corpusVec: String = "embedding",
                  queryId: String = "q_id", queryVec: String = "q_vec",
                  excludeSelf: Boolean = true): DataFrame = {
    // same per-row norm hoist as bruteForceTopK — the scan-side filter
    // stays a single dot kernel per (probe, vector) pair
    val joined = corpus.withColumn("__cn", norm2(col(corpusVec)))
      .join(broadcast(queries.withColumn("__qn", norm2(col(queryVec)))),
        if (excludeSelf) col(corpusId) =!= col(queryId) else lit(true))
    joined.select(
        col(queryId), col(corpusId).as("neighbor_id"),
        cosineHoisted(col(queryVec), col(corpusVec),
                      col("__qn"), col("__cn")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** P-bit random-hyperplane signature. Hyperplanes are seeded literals
    * (deterministic; generated driver-side once, evaluated scan-side). */
  def lshSignature(vec: Column, dim: Int, planes: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val hyperplanes = Array.fill(planes, dim)(rnd.nextGaussian())
    val bits = hyperplanes.zipWithIndex.map { case (hp, i) =>
      val hpCol = array(hp.map(v => lit(v)): _*)
      val proj = graft.functions.VecDot.vec_dot(vec, hpCol) // codegen'd
      when(proj >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via LSH bucket collision + exact rerank. Recall is tuned by
    * `planes` (fewer planes = bigger buckets = higher recall). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              planes: Int = 8, seed: Long = 42L): DataFrame = {
    val sigC = corpus.withColumn("bucket",
      lshSignature(col("embedding"), dim, planes, seed))
    val sigQ = queries.withColumn("bucket",
      lshSignature(col("q_vec"), dim, planes, seed))
    val cand = sigC.withColumn("__cn", norm2(col("embedding")))
      .join(broadcast(sigQ.withColumn("__qn", norm2(col("q_vec")))),
            Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
    val scored = cand.select(col("q_id"), col("vec_id").as("neighbor_id"),
      cosineHoisted(col("q_vec"), col("embedding"),
                    col("__qn"), col("__cn")).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** K-means centroid training for the IVF index (Lloyd's iterations via
    * `org.apache.spark.ml.clustering.KMeans` — public Spark MLlib API).
    * Deterministic under `seed`. Returns `(vec_id, embedding)` shaped like
    * a centroid table consumable by [[ivfAssign]]/[[ivfTopK]] (centroid
    * ids are 0..k-1).
    *
    * Scale shape: each Lloyd iteration is one broadcast of k centers +
    * one map-side-partial aggregation over the corpus (MLlib's
    * implementation) — the same per-pass cost as [[ivfAssign]] itself, so
    * training k ~ sqrt(N) centers on a sample (pass `trainFraction`) is
    * the standard 100 TB recipe: sample -> train -> assign full corpus. */
  def kmeansCentroids(corpus: DataFrame, k: Int, maxIter: Int = 10,
                      seed: Long = 42L, vecCol: String = "embedding",
                      trainFraction: Double = 1.0): DataFrame = {
    val sampled =
      if (trainFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, trainFraction, seed)
    val features = sampled.select(
      org.apache.spark.ml.functions.array_to_vector(
        col(vecCol).cast("array<double>")).as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setMaxIter(maxIter).setSeed(seed)
      .fit(features)
    val rows = model.clusterCenters.toSeq.zipWithIndex.map {
      case (c, i) => (i.toLong, c.toArray.map(_.toFloat).toSeq)
    }
    corpus.sparkSession.createDataFrame(rows)
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
  }

  /** IVF index build: nearest-centroid assignment. Centroids are a
    * deterministic corpus subset (ids ≡ 0 mod |corpus|/C) — a stand-in
    * for k-means that keeps everything seeded and engine-checkable.
    *
    * Scale shape: the corpus×C broadcast-NL join is narrow; the argmin is
    * a hash aggregate with `min_by` over a (dist, centroid_id) ordering
    * struct — map-side partials collapse each vector's C candidate rows
    * to ONE before the shuffle, so the exchange is bounded by |corpus|
    * (one row per vector), never corpus×C. (A `row_number` window here
    * would shuffle AND sort all corpus×C rows, embeddings included.)
    * The (dist, centroid_id) struct ordering makes ties deterministic. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = corpus.join(broadcast(
        centroids.select(col("vec_id").as("centroid_id"),
                         col("embedding").as("c_vec"))))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
              l2Distance(col("embedding"), col("c_vec")).as("dist"))
    assigned.groupBy(col("vec_id"))
      .agg(min_by(struct(col("centroid_id"), col("embedding")),
                  struct(col("dist"), col("centroid_id"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
              col("best.centroid_id").as("centroid_id"))
  }

  /** IVF query: probe the `nprobe` nearest inverted lists, exact rerank
    * within them. */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    val cent = centroids.select(col("vec_id").as("centroid_id"),
                                col("embedding").as("c_vec"))
    val qProbes = queries.join(broadcast(cent))
      .select(col("q_id"), col("q_vec"), col("centroid_id"),
              l2Distance(col("q_vec"), col("c_vec")).as("dist"))
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("dist"), col("centroid_id"))
    val probes = qProbes.withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("centroid_id"))
    val cand = assigned.withColumn("__cn", norm2(col("embedding")))
      .join(broadcast(probes.withColumn("__qn", norm2(col("q_vec")))),
            Seq("centroid_id"))
      .filter(col("vec_id") =!= col("q_id"))
    val scored = cand.select(col("q_id"), col("vec_id").as("neighbor_id"),
      cosineHoisted(col("q_vec"), col("embedding"),
                    col("__qn"), col("__cn")).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
