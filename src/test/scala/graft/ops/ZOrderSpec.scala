package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: bit-exactness of the interleave expression against a
  * reference Scala implementation, the dual-range-bound property of the
  * static Morton grid, and the write-side locality that justifies the
  * whole operator (per-file min/max ranges stay narrow in BOTH
  * dimensions, unlike a single-column sort). */
class ZOrderSpec extends SparkSpec {

  private def refInterleave(x: Long, y: Long, bits: Int = 16): Long =
    (0 until bits).map { k =>
      (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
    }.reduce(_ | _)

  test("interleave matches the reference implementation bit for bit") {
    import spark.implicits._
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (43690L, 21845L), (12345L, 54321L), (1L, 65535L), (32768L, 32768L))
    val got = samples.toDF("x", "y")
      .select(col("x"), col("y"),
              ZOrder.interleave(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == refInterleave(x, y), s"interleave($x, $y)")
    }
    // canonical identities: interleave(0xFFFF, 0) fills the even bits,
    // interleave(0, 0xFFFF) the odd bits, together the full 32
    assert(refInterleave(65535L, 0L) == 0x55555555L)
    assert(refInterleave(0L, 65535L) == 0xAAAAAAAAL)
  }

  test("static Morton grid bounds BOTH dimension ranges per bucket") {
    val rows = graft.SparkEntry.queries("q_layout_zorder")(spark, sfDir)
      .collect()
    assert(rows.length > 8, "expected a populated 2-D grid")
    rows.foreach { r =>
      val (b, d1r, d2r) = (r.getLong(0), r.getLong(3) - r.getLong(2),
                           r.getLong(5) - r.getLong(4))
      // a top-6-bit Morton cell spans 2^13 per dimension
      assert(d1r <= 8191, s"bucket $b d1 range $d1r exceeds the cell")
      assert(d2r <= 8191, s"bucket $b d2 range $d2r exceeds the cell")
    }
  }

  test("layout write keeps per-file ranges narrow in both dimensions") {
    import spark.implicits._
    // a uniform 2-D grid where the two dimensions are INDEPENDENT — the
    // adversarial case for single-column sorting
    val n = 1 << 14
    val df = (0 until n).map { i =>
      (i.toLong, (i * 2654435761L % n).toLong % 256L, (i % 256).toLong)
    }.toDF("id", "d1", "d2")
    def fileRanges(laid: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      laid.withColumn("f", spark_partition_id())
        .groupBy(col("f"))
        .agg((max(col("d1")) - min(col("d1"))).as("r1"),
             (max(col("d2")) - min(col("d2"))).as("r2"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val z = fileRanges(ZOrder.layout(df, col("d1"), col("d2"), 16,
                                     col("id")))
    val sorted = fileRanges(
      df.repartitionByRange(16, col("d1"), col("id")))
    def avg(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    val (z1, z2) = (avg(z.map(_._1)), avg(z.map(_._2)))
    val s2 = avg(sorted.map(_._2))
    // z-order: BOTH dims bounded well under the 255 domain; the d1 sort
    // leaves d2 spanning essentially the whole domain in every file
    assert(z1 < 128 && z2 < 128,
      s"z-order files span too much: d1=$z1 d2=$z2")
    assert(s2 > 200, s"control broken: sorted-layout d2 range $s2")
    assert(z2 < s2 / 2,
      s"z-order d2 range $z2 not meaningfully below sorted $s2")
  }
}
