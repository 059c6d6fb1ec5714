package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable SET-OPERATION sketches (Datasketches Theta) — the member of
  * the sketch family that HLL cannot replace: theta sketches support
  * INTERSECTION and DIFFERENCE, not just union. The 100 TB shape this
  * buys: persist one ~KB sketch per corpus slice (source, day, shard) in
  * a single scan, then answer "how many distinct n-grams do sources A
  * and B share" / "how many documents are new since yesterday" for ANY
  * pair by combining two sketches — no re-scan, no join, no shuffle of
  * raw data. That is decontamination/overlap sizing (|benchmark ∩
  * corpus| before committing to an exact pass) and incremental-corpus
  * accounting (|today \ yesterday|) at constant cost per question.
  *
  * Same execution shape as [[KllFunctions]]: `TypedImperativeAggregate`s
  * hold the heap Union per group and serialize ONLY across
  * partial/final shuffle boundaries (compact-sketch bytes); map-side
  * partial aggregation applies, so the shuffle carries one compact
  * sketch per partition-local group.
  *
  * Accuracy: exact below the nominal entry count (default lgK=12 →
  * 4096), ±~1.6% relative error at 2^12 beyond it; estimates of
  * intersections degrade with small Jaccard — use `theta_lb`/`theta_ub`
  * bounds when deciding on marginal overlaps. */
object ThetaFunctions {

  /** Aggregate: build a theta sketch (binary) over STRING / BIGINT /
    * BINARY values. NULLs are skipped (SQL aggregate convention). */
  def thetaSketchAgg(value: Column, lgK: Int = 12): Column =
    bridge.column(ThetaSketchAgg(bridge.expression(value), lgK)
      .toAggregateExpression())

  /** Aggregate: union pre-built theta sketch bytes (the rollup side). */
  def thetaUnionAgg(sketch: Column, lgK: Int = 12): Column =
    bridge.column(ThetaUnionAgg(bridge.expression(sketch), lgK)
      .toAggregateExpression())

  /** Scalar: estimated distinct count of a sketch. */
  def thetaEstimate(sketch: Column): Column =
    bridge.column(ThetaEstimate(bridge.expression(sketch)))

  /** Scalar: sketch of A ∩ B (binary) — feed to [[thetaEstimate]]. */
  def thetaIntersect(a: Column, b: Column): Column =
    bridge.column(ThetaIntersect(bridge.expression(a),
                                 bridge.expression(b)))

  /** Scalar: sketch of A \ B (binary) — "what is in A but not B". */
  def thetaANotB(a: Column, b: Column): Column =
    bridge.column(ThetaANotB(bridge.expression(a), bridge.expression(b)))

  /** Scalar: lower confidence bound on the distinct count at
    * `numStdDev` ∈ {1,2,3} standard deviations. */
  def thetaLb(sketch: Column, numStdDev: Int = 2): Column =
    bridge.column(ThetaBound(bridge.expression(sketch), numStdDev,
                             upper = false))

  /** Scalar: upper confidence bound (see [[thetaLb]]). */
  def thetaUb(sketch: Column, numStdDev: Int = 2): Column =
    bridge.column(ThetaBound(bridge.expression(sketch), numStdDev,
                             upper = true))

  private[functions] def heapify(bytes: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes))

  private[functions] def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
}

/** Shared TypedImperativeAggregate plumbing for the two theta
  * aggregates: heap Union buffer, compact-sketch bytes at shuffle
  * boundaries only. */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {
  def lgK: Int
  override def createAggregationBuffer(): Union =
    ThetaFunctions.newUnion(lgK)
  override def merge(buffer: Union, input: Union): Union = {
    buffer.union(input.getResult); buffer
  }
  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaFunctions.newUnion(lgK)
    u.union(ThetaFunctions.heapify(bytes))
    u
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `theta_sketch_agg(value, lgK)`: fold raw values into a theta
  * sketch. */
case class ThetaSketchAgg(child: Expression, lgK: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends ThetaAggBase {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires STRING, BIGINT, or BINARY input, " +
        s"got ${other.sql}")
  }
  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null                => ()
      case s: UTF8String      => buffer.update(s.toString)
      case l: java.lang.Long  => buffer.update(l.longValue())
      case b: Array[Byte]     => buffer.update(b)
    }
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
  override def prettyName: String = "theta_sketch_agg"
}

/** `theta_union_agg(sketchBytes, lgK)`: union pre-built sketches. */
case class ThetaUnionAgg(child: Expression, lgK: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends ThetaAggBase {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg requires BINARY sketch bytes, got ${child.dataType.sql}")
  override def update(buffer: Union, input: InternalRow): Union = {
    val bytes = child.eval(input)
    if (bytes != null)
      buffer.union(ThetaFunctions.heapify(bytes.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
  override def prettyName: String = "theta_union_agg"
}

/** `theta_estimate(sketchBytes)`: estimated distinct count. Exact (and
  * integer-valued) while the sketch never exceeded its nominal entries.
  * Post-aggregation scalar — CodegenFallback costs nothing here. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires BINARY sketch bytes, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(sk: Any): Any =
    ThetaFunctions.heapify(sk.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
  override def prettyName: String = "theta_estimate"
}

/** `theta_lb/theta_ub(sketchBytes, numStdDev)`: confidence bounds on
  * the distinct count — what a pipeline consults before acting on a
  * marginal overlap estimate. */
case class ThetaBound(child: Expression, numStdDev: Int, upper: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY sketch bytes, got ${child.dataType.sql}")
    else if (numStdDev < 1 || numStdDev > 3) TypeCheckResult.TypeCheckFailure(
      s"$prettyName: numStdDev must be 1, 2, or 3, got $numStdDev")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(sk: Any): Any = {
    val s = ThetaFunctions.heapify(sk.asInstanceOf[Array[Byte]])
    if (upper) s.getUpperBound(numStdDev) else s.getLowerBound(numStdDev)
  }
  override protected def withNewChildInternal(c: Expression): ThetaBound =
    copy(child = c)
  override def prettyName: String = if (upper) "theta_ub" else "theta_lb"
}

/** `theta_intersect(a, b)`: compact sketch of A ∩ B. */
case class ThetaIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_intersect requires (BINARY, BINARY), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaFunctions.heapify(a.asInstanceOf[Array[Byte]]),
                 ThetaFunctions.heapify(b.asInstanceOf[Array[Byte]]))
      .toByteArray
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersect = copy(left = l, right = r)
  override def prettyName: String = "theta_intersect"
}

/** `theta_a_not_b(a, b)`: compact sketch of A \ B. */
case class ThetaANotB(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_a_not_b requires (BINARY, BINARY), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaFunctions.heapify(a.asInstanceOf[Array[Byte]]),
             ThetaFunctions.heapify(b.asInstanceOf[Array[Byte]]))
      .toByteArray
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaANotB = copy(left = l, right = r)
  override def prettyName: String = "theta_a_not_b"
}
