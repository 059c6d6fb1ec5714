package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.VecDot

/** Optimizer rule: rewrite the higher-order-function dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[VecDot]] expression. HOFs evaluate interpreted
  * with per-row array allocation; VecDot is a fused loop inside
  * whole-stage codegen (~50x on similarity scans, see VecDot docs) and is
  * bit-identical: both promote elements to double and accumulate
  * sequentially. `transform(v, x -> cast(x as double))` wrappers are
  * unwrapped (VecDot promotes internally).
  *
  * Registered via [[GraftExtensions]] (new sessions) or
  * `bridge.installOptimizations` (existing sessions) — users keep writing
  * the declarative HOF form and get the kernel for free.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** x, possibly under a cast to double, resolving to lambda var `v`. */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case Cast(inner, DoubleType, _, _) => isVar(inner, v)
    case _ => false
  }

  /** transform(base, x -> cast(x as double)) -> base */
  private def unwrapDoubleCast(e: Expression): Expression = e match {
    case ArrayTransform(base, LambdaFunction(body, Seq(v: NamedLambdaVariable), _))
        if isVar(body, v) && isNumericArray(base) => base
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case orig @ ArrayAggregate(
            ZipWith(la, ra,
              LambdaFunction(mul @ Multiply(mx, my, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(aAcc, aVal, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fAcc: NamedLambdaVariable), _))
          if mul.dataType == DoubleType &&
             ((isVar(mx, x) && isVar(my, y)) || (isVar(mx, y) && isVar(my, x))) &&
             ((isVar(aAcc, acc) && isVar(aVal, v)) ||
              (isVar(aAcc, v) && isVar(aVal, acc))) &&
             isVar(fin, fAcc) => {
        // mul.dataType == DoubleType is the value-preservation guard: it
        // means each element reaches the multiply already promoted to
        // double (double arrays, or explicit casts) — exactly VecDot's
        // semantics. A FLOAT-precision multiply (raw float arrays, cast
        // only at the accumulate) would round differently and must NOT
        // be rewritten.
        val (l, r) = (unwrapDoubleCast(la), unwrapDoubleCast(ra))
        if (isNumericArray(l) && isNumericArray(r)) VecDot(l, r) else orig
      }
    }
}
