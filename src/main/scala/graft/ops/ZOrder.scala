package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) layout: interleave the bits of two clustering
  * dimensions so that range-partitioning on the single z-value co-locates
  * rows that are close in BOTH dimensions — the standard multi-dimension
  * data-clustering technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  * At 100 TB the payoff is scan pruning: parquet row-group min/max stats
  * on the two raw columns stay NARROW within every z-partitioned file, so
  * a predicate on EITHER dimension skips most files — a single-column
  * sort gives that for one dimension only.
  *
  * The z-value is pure codegen'd bit arithmetic (shift/and/or — no UDF),
  * and deliberately engine-portable: the same expression is expressible
  * in ANSI SQL, so the layout assignment is DuckDB-oracle-checkable
  * (`q_layout_zorder`).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative columns:
    * bit k of `x` lands at position 2k, bit k of `y` at 2k+1. 16+16 bits
    * fills 32 of a long's bits — plenty for bucketing (the z-value is a
    * LAYOUT key, not an identity; callers mod/clamp the inputs). */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { k =>
      shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k)
        .bitwiseOR(
          shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce(_.bitwiseOR(_)).as(s"z")
  }

  /** The same interleave as ANSI SQL text (DuckDB dialect-compatible) —
    * mirrors [[interleave]] bit for bit so oracle queries can recompute
    * the layout assignment independently. */
  def interleaveSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { k =>
      s"((($x >> $k) & 1) << ${2 * k}) | ((($y >> $k) & 1) << ${2 * k + 1})"
    }.mkString("(", " | ", ")")

  /** Write-side layout: range-partition the frame by z-value into
    * `numFiles` partitions (one output file each when written). The range
    * exchange samples the z distribution, so files get balanced row
    * counts AND contiguous z-ranges — which is exactly what keeps both
    * dimensions' per-file min/max stats narrow. `ord` breaks z ties
    * deterministically. */
  def layout(df: DataFrame, x: Column, y: Column, numFiles: Int,
             ord: Column*): DataFrame =
    df.withColumn("__z", interleave(x, y))
      .repartitionByRange(numFiles, col("__z") +: ord: _*)
      .sortWithinPartitions(col("__z") +: ord: _*)
      .drop("__z")
}
