package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** The concurrent maintainer-fold helper must behave exactly like the
  * sequential fold it replaced: results in registration order, and a
  * failing step surfacing its OWN exception (not the pool's wrapper). */
class StepConcurrentlySpec extends AnyFunSuite {

  test("parSteps preserves registration order") {
    var got: Seq[Any] = Seq.empty
    TableViews.stepConcurrently(4) { parSteps =>
      got = parSteps((0 until 8).map { i =>
        () => { Thread.sleep((8 - i) * 10L); i }: Any
      })
    }
    assert(got == (0 until 8), "slow early steps must not reorder results")
  }

  test("steps genuinely overlap") {
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    TableViews.stepConcurrently(4) { parSteps =>
      parSteps((0 until 4).map { _ =>
        () => {
          val n = active.incrementAndGet()
          peak.accumulateAndGet(n, math.max)
          Thread.sleep(100L)
          active.decrementAndGet(): Any
        }
      })
    }
    assert(peak.get() >= 2,
      s"expected overlapping steps, saw peak concurrency ${peak.get()}")
  }

  test("a failing step rethrows its own exception") {
    val boom = new IllegalStateException("maintainer 2 failed")
    val thrown = intercept[IllegalStateException] {
      TableViews.stepConcurrently(4) { parSteps =>
        parSteps(Seq(() => 1: Any, () => throw boom, () => 3: Any))
      }
    }
    assert(thrown eq boom,
      "the step's own exception must surface, not an ExecutionException")
  }

  test("width 1 degenerates to the sequential fold") {
    var got: Seq[Any] = Seq.empty
    TableViews.stepConcurrently(1) { parSteps =>
      got = parSteps((0 until 4).map(i => () => i: Any))
    }
    assert(got == (0 until 4))
  }
}
