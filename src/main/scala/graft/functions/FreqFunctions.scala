package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable HEAVY-HITTERS sketches (Datasketches frequent-items),
  * completing the sketch triad next to HLL (distinct counts,
  * `q_hll_mergeable`) and KLL (quantiles, [[KllFunctions]]): exact
  * per-token counting of a 100 TB corpus shuffles |vocabulary| rows per
  * partition; a frequent-items sketch caps state at `maxMapSize`
  * entries, merges associatively, and guarantees every item with
  * frequency > N/maxMapSize survives (no false negatives under
  * `ErrorType.NO_FALSE_NEGATIVES`) with count error ≤ the sketch's
  * tracked bound. The classic "top tokens / hot keys per partition"
  * primitive: persist per-shard sketches, answer any rollup by merge.
  *
  * Same execution shape as [[KllFunctions]]: `TypedImperativeAggregate`
  * — heap sketch per group, serialized bytes only at shuffle
  * boundaries, map-side partial aggregation. */
object FreqFunctions {

  private val serde = new ArrayOfStringsSerDe

  /** Aggregate: build a frequent-strings sketch (binary) over a STRING
    * column. NULLs are skipped. `maxMapSize` (power of 2) bounds sketch
    * state; error ≤ 3.5 * N / maxMapSize. */
  def freqSketchAgg(value: Column, maxMapSize: Int = 256): Column =
    bridge.column(FreqSketchAgg(bridge.expression(value), maxMapSize)
      .toAggregateExpression())

  /** Aggregate: merge pre-built frequent-strings sketch bytes. */
  def freqMergeAgg(sketch: Column, maxMapSize: Int = 256): Column =
    bridge.column(FreqMergeAgg(bridge.expression(sketch), maxMapSize)
      .toAggregateExpression())

  /** Scalar: the sketch's heavy hitters as
    * `array<struct<item:string, estimate:long, lower:long, upper:long>>`,
    * most frequent first, no false negatives. */
  def freqItems(sketch: Column): Column =
    bridge.column(FreqItems(bridge.expression(sketch)))

  private[functions] def heapify(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  private[functions] def toBytes(sk: ItemsSketch[String]): Array[Byte] =
    sk.toByteArray(serde)
}

/** Shared TypedImperativeAggregate plumbing for the two aggregates. */
abstract class FreqAggBase extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {
  def maxMapSize: Int
  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)
  override def merge(buffer: ItemsSketch[String],
                     input: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(input); buffer
  }
  override def eval(buffer: ItemsSketch[String]): Any =
    FreqFunctions.toBytes(buffer)
  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    FreqFunctions.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqFunctions.heapify(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `freq_sketch_agg(value, maxMapSize)`: fold strings into a sketch. */
case class FreqSketchAgg(child: Expression, maxMapSize: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends FreqAggBase {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg requires a STRING input, got ${child.dataType.sql}")
  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
  override def prettyName: String = "freq_sketch_agg"
}

/** `freq_merge_agg(sketchBytes, maxMapSize)`: union pre-built sketches. */
case class FreqMergeAgg(child: Expression, maxMapSize: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends FreqAggBase {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_merge_agg requires BINARY sketch bytes, got ${child.dataType.sql}")
  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val bytes = child.eval(input)
    if (bytes != null)
      buffer.merge(FreqFunctions.heapify(bytes.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FreqMergeAgg =
    copy(child = c)
  override def prettyName: String = "freq_merge_agg"
}

/** `freq_items(sketchBytes)`: heavy hitters, most frequent first, under
  * NO_FALSE_NEGATIVES (every true heavy hitter is present; some items
  * near the threshold may be, too — the caller filters by lower bound
  * if it needs certainty). Post-aggregation scalar, one eval per group. */
case class FreqItems(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_items requires BINARY sketch bytes, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("estimate", LongType),
    StructField("lower", LongType),
    StructField("upper", LongType))), containsNull = false)
  override protected def nullSafeEval(sk: Any): Any = {
    val rows = FreqFunctions.heapify(sk.asInstanceOf[Array[Byte]])
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map { r =>
      InternalRow(UTF8String.fromString(r.getItem),
                  r.getEstimate, r.getLowerBound, r.getUpperBound)
    }.toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): FreqItems =
    copy(child = c)
  override def prettyName: String = "freq_items"
}
