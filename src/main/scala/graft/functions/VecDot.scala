package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Base for codegen'd element-wise fold kernels over two numeric array
  * columns — the custom Catalyst expressions this engine needs
  * (SURVEY.md §4): the built-in higher-order-function forms
  * (`aggregate(zip_with(...))`) are semantically identical but evaluate
  * interpreted with per-row array allocations, which dominates similarity
  * scans (measured ~50x slower at sf0.1). These compile to tight fused
  * loops inside whole-stage codegen.
  *
  * Semantics exactly match the HOF/DuckDB-DOUBLE[] form:
  *  - each element is promoted to double FIRST, accumulation is
  *    sequential in index order (cross-engine ulp-exact);
  *  - result is NULL when either array is NULL, the lengths differ
  *    (zip_with pads with NULL -> NULL sum), or any element is NULL —
  *    identical to what the interpreted HOF returns, which is what makes
  *    [[graft.plans.VecDotRewrite]] a sound rewrite.
  */
abstract class VecFoldExpression extends BinaryExpression {

  /** per-element combine, interpreted path */
  protected def combineEval(x: Double, y: Double): Double
  /** per-element combine, codegen: java statements accumulating into
    * `acc` from double expressions `x`, `y` */
  protected def combineCode(ctx: CodegenContext, x: String, y: String,
                            acc: String): String
  protected def prettyTag: String

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"$prettyTag expects array inputs, got ${other.sql}")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyTag requires array<float|double> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def get(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += combineEval(get(a, lt, i), get(b, rt, i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def accessor(v: String, dt: DataType, i: String): String = dt match {
      case FloatType => s"((double) $v.getFloat($i))"
      case _ => s"$v.getDouble($i)"
    }
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    ${combineCode(ctx, accessor(a, lt, i), accessor(b, rt, i), s)}
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })
  }
}

/** Codegen'd dot product Σ x·y. */
case class VecDot(left: Expression, right: Expression)
    extends VecFoldExpression {
  override protected def prettyTag: String = "vec_dot"
  override protected def combineEval(x: Double, y: Double): Double = x * y
  override protected def combineCode(ctx: CodegenContext, x: String,
                                     y: String, acc: String): String =
    s"$acc += $x * $y;"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared-L2 distance Σ (x-y)². `sqrt` applied by the caller. */
case class VecL2Sq(left: Expression, right: Expression)
    extends VecFoldExpression {
  override protected def prettyTag: String = "vec_l2sq"
  override protected def combineEval(x: Double, y: Double): Double = {
    val d = x - y; d * d
  }
  override protected def combineCode(ctx: CodegenContext, x: String,
                                     y: String, acc: String): String = {
    val d = ctx.freshName("d")
    s"double $d = $x - $y; $acc += $d * $d;"
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  import org.apache.spark.sql.graft.bridge
  /** Column-level entry points, mirroring `functions._` style (Spark 4
    * wraps Column around ColumnNode; the bridge converts to/from catalyst
    * expressions). */
  def vec_dot(a: Column, b: Column): Column =
    bridge.column(VecDot(bridge.expression(a), bridge.expression(b)))

  def vec_l2sq(a: Column, b: Column): Column =
    bridge.column(VecL2Sq(bridge.expression(a), bridge.expression(b)))
}
