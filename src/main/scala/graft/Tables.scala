package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables (parquet/iceberg on object
  * storage); here each table is a single parquet file per scale factor.
  * All reads go through `spark.read.parquet` so Catalyst gets predicate
  * pushdown + column pruning for free on every query built on top.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Spread `df` across at least the session's default parallelism — used
    * in front of CPU-bound kernels (JSON synthesis, shingle hashing) where
    * the input is a small single-partition file that would otherwise pin
    * the whole pipeline to one core. No-op when the input is already
    * partitioned at least that wide (so a production-scale input with
    * thousands of partitions is never reshuffled). */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Cast any TIMESTAMP_NTZ column to the session-zoned TimestampType.
    * The driver's generator writes parquet `timestamp[us]` without
    * isAdjustedToUTC, which Spark (inferTimestampNTZ on by default) reads
    * as TIMESTAMP_NTZ — a type `unix_micros`, watermarks, and stream
    * event-time all reject. The session TZ is pinned UTC (build.sbt), so
    * the cast is value-neutral, and columns already read as LTZ pass
    * through untouched. */
  private def normalizeTimestamps(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.TimestampNTZType
    val ntz = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntz.foldLeft(df)((d, c) =>
      d.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampType)))
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeTimestamps {
      if (name == "events") {
        // events.ts has at times been written as parquet TIMESTAMP(NANOS),
        // which Spark's vectorized reader rejects outright. Read nanos as
        // raw long and convert to the native microsecond TimestampType
        // (integer `div`, not double division — epoch-nanos exceed 2^53
        // and would lose precision). Conditional on the read type so an
        // events table written with ordinary micros timestamps loads
        // unchanged.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$sfDir/$name.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _ => raw
        }
      } else spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
