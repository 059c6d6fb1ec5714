package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** Column surface over Spark's built-in bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same
  * codegen'd kernels Catalyst injects for runtime join pruning, which
  * Spark registers only internally, not as SQL functions). Exposed via
  * the [[bridge]] accessor so pipelines can build and probe filters as
  * ordinary Columns — no UDF, no driver-side filter object.
  *
  * Contract: `value` must be an xxhash64-style BIGINT (the aggregate
  * hashes longs); hash on both the build and probe side with the same
  * expression. */
object SketchFunctions {

  /** Aggregate: build a bloom filter (binary) over a LongType column. */
  def bloomFilterAgg(value: Column, estimatedNumItems: Long,
                     numBits: Long): Column =
    bridge.column(new BloomFilterAggregate(
        bridge.expression(value),
        Literal(estimatedNumItems), Literal(numBits))
      .toAggregateExpression())

  /** Probe: true iff `value` may be in the filter (false = definitely
    * absent; true = present OR false positive). */
  def mightContain(bloomFilter: Column, value: Column): Column =
    bridge.column(BloomFilterMightContain(
      bridge.expression(bloomFilter), bridge.expression(value)))
}
