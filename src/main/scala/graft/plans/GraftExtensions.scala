package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions._

/** The graft SQL function surface, shared by [[GraftExtensions]]
  * (builder-time `withExtensions`) and `bridge.installGraft`
  * (already-built sessions) — one builder table so the two registration
  * paths can never drift. */
object GraftFunctions {

  private def nArgs(fn: String, exprs: Seq[Expression],
                    lo: Int, hi: Int): Unit =
    require(exprs.length >= lo && exprs.length <= hi,
      s"$fn takes $lo" + (if (hi > lo) s"-$hi" else "") +
        s" arguments, got ${exprs.length}")

  /** Optional trailing INT literal (sketch size parameters must be
    * plan-time constants — they shape the aggregation buffer). */
  private def intArg(fn: String, exprs: Seq[Expression], i: Int,
                     default: Int): Int =
    if (exprs.length <= i) default
    else exprs(i) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an INT literal, got ${other.sql}")
    }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { exprs =>
      nArgs("vec_dot", exprs, 2, 2); VecDot(exprs(0), exprs(1))
    },
    "kll_sketch_agg" -> { exprs =>
      nArgs("kll_sketch_agg", exprs, 1, 2)
      KllSketchAgg(exprs(0), intArg("kll_sketch_agg", exprs, 1, 200))
    },
    "kll_merge_agg" -> { exprs =>
      nArgs("kll_merge_agg", exprs, 1, 2)
      KllMergeAgg(exprs(0), intArg("kll_merge_agg", exprs, 1, 200))
    },
    "kll_quantile" -> { exprs =>
      nArgs("kll_quantile", exprs, 2, 2); KllQuantile(exprs(0), exprs(1))
    },
    "kll_count" -> { exprs =>
      nArgs("kll_count", exprs, 1, 1); KllCount(exprs(0))
    },
    "freq_sketch_agg" -> { exprs =>
      nArgs("freq_sketch_agg", exprs, 1, 2)
      FreqSketchAgg(exprs(0), intArg("freq_sketch_agg", exprs, 1, 256))
    },
    "freq_merge_agg" -> { exprs =>
      nArgs("freq_merge_agg", exprs, 1, 2)
      FreqMergeAgg(exprs(0), intArg("freq_merge_agg", exprs, 1, 256))
    },
    "freq_items" -> { exprs =>
      nArgs("freq_items", exprs, 1, 1); FreqItems(exprs(0))
    },
    "theta_sketch_agg" -> { exprs =>
      nArgs("theta_sketch_agg", exprs, 1, 2)
      ThetaSketchAgg(exprs(0), intArg("theta_sketch_agg", exprs, 1, 12))
    },
    "theta_union_agg" -> { exprs =>
      nArgs("theta_union_agg", exprs, 1, 2)
      ThetaUnionAgg(exprs(0), intArg("theta_union_agg", exprs, 1, 12))
    },
    "theta_estimate" -> { exprs =>
      nArgs("theta_estimate", exprs, 1, 1); ThetaEstimate(exprs(0))
    },
    "theta_intersect" -> { exprs =>
      nArgs("theta_intersect", exprs, 2, 2)
      ThetaIntersect(exprs(0), exprs(1))
    },
    "theta_a_not_b" -> { exprs =>
      nArgs("theta_a_not_b", exprs, 2, 2); ThetaANotB(exprs(0), exprs(1))
    },
    "theta_lb" -> { exprs =>
      nArgs("theta_lb", exprs, 1, 2)
      ThetaBound(exprs(0), intArg("theta_lb", exprs, 1, 2), upper = false)
    },
    "theta_ub" -> { exprs =>
      nArgs("theta_ub", exprs, 1, 2)
      ThetaBound(exprs(0), intArg("theta_ub", exprs, 1, 2), upper = true)
    })
}

/** Session extensions for the graft engine:
  *
  *  - the graft SQL functions ([[GraftFunctions]]: `vec_dot`, the KLL
  *    quantile-sketch family, the frequent-items family, the theta
  *    set-operation family)
  *  - [[VecDotRewrite]] injected into the optimizer
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. For an
  * already-built session use `org.apache.spark.sql.graft.bridge
  * .installGraft(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftFunctions.type].getName, name),
        builder))
    }
    e.injectOptimizerRule(_ => VecDotRewrite)
  }
}
