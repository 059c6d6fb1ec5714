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

/** Codegen'd nearest-centroid scan over a LOCAL codebook: returns the
  * struct `(d, cid)` of the minimum L2 distance (then centroid-id
  * tie-break) from the input `array<float>` vector to the `cents` rows.
  *
  * Why an expression and not a composition: the composed form
  * (`array_min(array(struct(l2(v, lit(c_i)), id_i)...))`) inlines one
  * fused kernel PER CENTROID into the enclosing stage — at a realistic
  * coarse-quantizer size the generated method crosses Janino's 64 KB
  * limit ("Code grows beyond 64 KB", observed at C = 100 inside the
  * drift maintainer's aggregate stage) and the whole stage silently
  * drops to interpreted evaluation. Here the codebook is a single
  * codegen REFERENCE OBJECT and the scan is one tiny double loop —
  * constant code size at any C, and the arithmetic is bit-identical to
  * the composed form (per-element double promotion, sequential
  * accumulation, `Math.sqrt`, (d, cid) struct ordering).
  *
  * NULL contract: NULL input → NULL; a NULL element or a length
  * mismatch against the (uniform-dimension) codebook → NULL. */
case class NearestCentroid(child: Expression, ids: Array[Long],
                           cents: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(ids.nonEmpty && ids.length == cents.length,
    "nearest_centroid: ids and cents must be same-length and non-empty")
  require(cents.forall(_.length == cents(0).length),
    "nearest_centroid: codebook rows must share one dimension")

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != cents(0).length) return null
    // non-finite distances must order like Spark's struct min over the
    // composed form: NaN compares GREATER than every value and EQUAL to
    // itself (so an all-NaN row yields (NaN, min id), never a phantom
    // centroid 0), and +Infinity ties break to the min id —
    // `Double.compare` semantics, seeded from the FIRST centroid
    // instead of a sentinel no comparison can beat. Distances are
    // sqrt(Σ d²) ≥ 0, so compare's -0.0 < 0.0 quirk cannot bite.
    var bestD = 0.0
    var bestC = 0L
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var s = 0.0
      var i = 0
      while (i < cv.length) {
        if (a.isNullAt(i)) return null
        val d = a.getFloat(i).toDouble - cv(i).toDouble
        s += d * d
        i += 1
      }
      val dist = math.sqrt(s)
      val cmp = if (c == 0) -1 else java.lang.Double.compare(dist, bestD)
      if (cmp < 0 || (cmp == 0 && ids(c) < bestC)) {
        bestD = dist
        bestC = ids(c)
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "float[][]")
    val iRef = ctx.addReferenceObj("ids", ids, "long[]")
    val rowCls = classOf[
      org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val cv = ctx.freshName("cv")
      val dist = ctx.freshName("dist")
      val bd = ctx.freshName("bestD")
      val bc = ctx.freshName("bestC")
      val cmp = ctx.freshName("cmp")
      s"""
         |if ($a.numElements() != $cRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $bd = 0.0;
         |  long $bc = 0L;
         |  for (int $c = 0; $c < $cRef.length && !${ev.isNull}; $c++) {
         |    float[] $cv = $cRef[$c];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $cv.length; $i++) {
         |      if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      double $d = ((double) $a.getFloat($i)) - ((double) $cv[$i]);
         |      $s += $d * $d;
         |    }
         |    if (!${ev.isNull}) {
         |      double $dist = java.lang.Math.sqrt($s);
         |      // Double.compare semantics: NaN > everything, NaN == NaN
         |      // — all-NaN rows keep a real (NaN, min id) result instead
         |      // of a phantom centroid 0 (see nullSafeEval, identical)
         |      int $cmp = ($c == 0) ? -1 : java.lang.Double.compare($dist, $bd);
         |      if ($cmp < 0 || ($cmp == 0 && $iRef[$c] < $bc)) {
         |        $bd = $dist;
         |        $bc = $iRef[$c];
         |      }
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new $rowCls(new Object[] {
         |      java.lang.Double.valueOf($bd), java.lang.Long.valueOf($bc) });
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
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

  /** `(d, cid)` of the nearest codebook row — see [[NearestCentroid]]. */
  def nearest_centroid(v: Column, ids: Array[Long],
                       cents: Array[Array[Float]]): Column =
    bridge.column(NearestCentroid(bridge.expression(v), ids, cents))
}
