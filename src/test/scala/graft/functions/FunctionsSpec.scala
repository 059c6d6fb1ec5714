package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Custom expression + UDF/UDAF surface. */
class FunctionsSpec extends SparkSpec {

  test("VecDot matches the HOF formulation exactly (codegen path)") {
    val e = graft.Tables.load(spark, sfDir, "embeddings").limit(100)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(500)
    val hof = aggregate(
      zip_with(VectorFunctions.asDouble(col("va")),
               VectorFunctions.asDouble(col("vb")), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = pairs.select(
        VecDot.vec_dot(col("va"), col("vb")).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0) // bit-exact, not just approximate
  }

  test("VecDot handles double arrays and mixed float/double") {
    val df = spark.sql(
      "SELECT array(1.0D, 2.0D, 3.0D) AS d, array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS f")
    val r = df.select(
      VecDot.vec_dot(col("d"), col("d")).as("dd"),
      VecDot.vec_dot(col("d"), col("f")).as("df"),
      VecDot.vec_dot(col("f"), col("f")).as("ff")).head()
    assert(r.getDouble(0) == 14.0)
    assert(r.getDouble(1) == 20.0)
    assert(r.getDouble(2) == 29.0)
  }

  test("NearestCentroid matches the composed array_min form at any C") {
    // the kernel replaced array_min(array(struct(l2, id)...)) because
    // the composed form blows Janino's 64 KB method limit at realistic
    // C — the two must stay bit-identical where the composed form still
    // compiles (C here = 12), including the (d, cid) tie-break
    val e = graft.Tables.load(spark, sfDir, "embeddings").limit(200)
      .select(col("vec_id"), col("embedding"))
    val cents = e.limit(12).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val composed = array_min(array(cents.map { case (cid, cv) =>
      struct(VectorFunctions.l2Distance(col("embedding"),
               typedLit(cv.toSeq).cast("array<float>")).as("d"),
             lit(cid).as("cid"))
    }: _*))
    val fast = VecDot.nearest_centroid(col("embedding"),
      cents.map(_._1), cents.map(_._2))
    val diff = e.select(
        fast.getField("d").as("fd"), fast.getField("cid").as("fc"),
        composed.getField("d").as("cd"), composed.getField("cid").as("cc"))
      .filter(col("fd") =!= col("cd") || col("fc") =!= col("cc"))
    assert(diff.count() == 0,
      "NearestCentroid diverges from the composed array_min form")
    // tie-break: two identical codebook rows -> the smaller id wins
    val dup = VecDot.nearest_centroid(col("embedding"),
      Array(9L, 3L), Array(cents(0)._2, cents(0)._2))
    val tied = e.limit(5).select(dup.getField("cid").as("c")).collect()
    assert(tied.forall(_.getLong(0) == 3L), "tie must break to min id")
    // null contract: null vector and wrong dimension -> null
    val nulls = spark.sql(
      "SELECT CAST(NULL AS ARRAY<FLOAT>) AS v, array(CAST(1.0 AS FLOAT)) AS w")
      .select(VecDot.nearest_centroid(col("v"), Array(1L),
                Array(cents(0)._2)).as("a"),
              VecDot.nearest_centroid(col("w"), Array(1L),
                Array(cents(0)._2)).as("b")).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("NearestCentroid non-finite distances: NaN orders last, Inf ties to min id") {
    // an all-NaN distance row (NaN element in the vector payload) must
    // return (NaN, min id) — Spark's composed array_min orders NaN
    // GREATER than every value and EQUAL to itself — never the phantom
    // (Infinity, 0) a sentinel-seeded loop produces when no comparison
    // can beat POSITIVE_INFINITY; ids here deliberately exclude 0
    val ids = Array(7L, 3L)
    val cents = Array(Array(1.0f, 2.0f), Array(3.0f, 4.0f))
    val nan = spark.sql(
      "SELECT array(CAST('NaN' AS FLOAT), CAST(1.0 AS FLOAT)) AS v")
      .select(VecDot.nearest_centroid(col("v"), ids, cents).as("nc"))
      .select(col("nc.d").as("d"), col("nc.cid").as("cid")).head()
    assert(nan.getDouble(0).isNaN, "all-NaN distances must propagate NaN")
    assert(nan.getLong(1) == 3L,
      "all-NaN distances must tie-break to the min id, not centroid 0")
    // extreme-magnitude floats do NOT overflow the double accumulator
    // (max element diff 6.8e38, squared 4.6e77 ≪ Double.MaxValue), so
    // the worst-case finite tie still breaks to the min id
    val big = Float.MaxValue
    val ext = spark.sql(
      s"SELECT array(CAST(-$big AS FLOAT), CAST(-$big AS FLOAT)) AS v")
      .select(VecDot.nearest_centroid(col("v"), ids,
        Array(Array(big, big), Array(big, big))).as("nc"))
      .select(col("nc.d").as("d"), col("nc.cid").as("cid")).head()
    assert(!ext.getDouble(0).isNaN && ext.getDouble(0) > 0 &&
             ext.getLong(1) == 3L,
      "extreme-magnitude ties must stay finite and break to the min id")
    // interpreted path must agree exactly (the eval/codegen contract)
    val expr = graft.functions.NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(Float.NaN, 1.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)), ids, cents)
    val row = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getDouble(0).isNaN && row.getLong(1) == 3L,
      "nullSafeEval must match the codegen path on non-finite distances")
  }

  test("VecDot rejects non-array inputs at analysis time") {
    val df = spark.sql("SELECT 1 AS x")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VecDot.vec_dot(col("x"), col("x"))).collect()
    }
  }

  test("VecDot null semantics match the HOF: null array/element/ragged -> null") {
    val df = spark.sql(
      """SELECT CAST(NULL AS ARRAY<DOUBLE>) AS n,
        |array(1.0D, CAST(NULL AS DOUBLE), 3.0D) AS withNull,
        |array(1.0D, 1.0D, 1.0D) AS ones,
        |array(1.0D, 1.0D) AS two""".stripMargin)
    val r = df.select(
      VecDot.vec_dot(col("n"), col("ones")).as("nullArr"),
      VecDot.vec_dot(col("withNull"), col("ones")).as("nullElem"),
      VecDot.vec_dot(col("two"), col("ones")).as("ragged"),
      VecDot.vec_dot(col("ones"), col("ones")).as("ok")).head()
    assert(r.isNullAt(0))
    assert(r.isNullAt(1)) // HOF parity: null element poisons the sum
    assert(r.isNullAt(2)) // HOF parity: zip_with pads -> null sum
    assert(r.getDouble(3) == 3.0)
    // and the HOF itself agrees on the null-element case
    val hof = df.select(aggregate(
      zip_with(col("withNull"), col("ones"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x).as("h")).head()
    assert(hof.isNullAt(0))
  }

  test("TopKAggregator equals the window top-k") {
    import org.apache.spark.sql.Encoders
    val topk = udaf(new TopKAggregator(3), Encoders.product[(Double, Long)])
    val o = graft.Tables.load(spark, sfDir, "orders")
    val viaAgg = o.groupBy(col("o_orderstatus"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("ids"))
      .select(col("o_orderstatus"), posexplode(col("ids")))
      .select(col("o_orderstatus"), col("pos"), col("col").as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWin = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderstatus"), (col("rn") - 1).cast("int").as("pos"),
              col("o_orderkey").as("k"))
    assert(viaAgg.exceptAll(viaWin).count() == 0)
    assert(viaWin.exceptAll(viaAgg).count() == 0)
  }

  test("scalar UDF registration surface (handler-parity escape hatch)") {
    spark.udf.register("graft_tok", (s: String) =>
      if (s == null) 0 else s.trim.split("\\s+").length)
    val got = spark.sql("SELECT graft_tok('a b  c') AS n").head().getInt(0)
    assert(got == 3)
    // built-in stays the preferred (codegen) path; both agree
    val doc = graft.Tables.load(spark, sfDir, "documents").limit(50)
    val both = doc.select(
      expr("graft_tok(text)").as("viaUdf"),
      graft.text.TextAnalysis.tokenCount(col("text")).as("viaExpr"))
    assert(both.filter(col("viaUdf") =!= col("viaExpr")).count() == 0)
  }

  test("frequent-items sketch: exact under capacity, NFN bounds over it") {
    import graft.functions.FreqFunctions._
    import spark.implicits._
    def items(df: org.apache.spark.sql.DataFrame, map: Int) = df
      .agg(freqSketchAgg(col("tok"), map).as("sk"))
      .select(explode(freqItems(col("sk"))).as("hh"))
      .select(col("hh.item"), col("hh.estimate"),
              col("hh.lower"), col("hh.upper"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // UNDER capacity: counts are exact, bounds collapse to the estimate
    val small = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val exact = items(small.toDF("tok"), 64)
    assert(exact == Map("a" -> ((5L, 5L, 5L)), "b" -> ((3L, 3L, 3L)),
                        "c" -> ((1L, 1L, 1L))))
    // OVER capacity (2000 distinct rare + 3 planted heavies through a
    // 64-slot map -> purges): every true heavy hitter must survive
    // (NO_FALSE_NEGATIVES) with its true count inside [lower, upper]
    val big = (Seq.fill(500)("aaa") ++ Seq.fill(400)("bbb") ++
      Seq.fill(300)("ccc") ++ (0 until 2000).map(i => s"noise_$i"))
    val sk = items(big.toDF("tok"), 64)
    for ((t, c) <- Seq("aaa" -> 500L, "bbb" -> 400L, "ccc" -> 300L)) {
      assert(sk.contains(t), s"heavy hitter $t purged — false negative")
      val (_, lo, hi) = sk(t)
      assert(lo <= c && c <= hi, s"$t true count $c outside [$lo, $hi]")
    }
    // sharded build + merge obeys the same contract (the rollup path)
    val merged = big.zipWithIndex.toDF("tok", "i")
      .groupBy((col("i") % 4).as("shard"))
      .agg(freqSketchAgg(col("tok"), 64).as("sk"))
      .agg(freqMergeAgg(col("sk"), 64).as("sk"))
      .select(explode(freqItems(col("sk"))).as("hh"))
      .select(col("hh.item"), col("hh.lower"), col("hh.upper"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((t, c) <- Seq("aaa" -> 500L, "bbb" -> 400L, "ccc" -> 300L)) {
      assert(merged.contains(t), s"merge lost heavy hitter $t")
      val (lo, hi) = merged(t)
      assert(lo <= c && c <= hi, s"merged $t count $c outside [$lo, $hi]")
    }
  }
}
