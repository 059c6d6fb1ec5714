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

  test("a failing step cancels its still-running siblings") {
    // the failure path must not abandon siblings to race the caller's
    // finally cleanup: step 0 fails, step 1 blocks indefinitely — the
    // rethrow must be preceded by an interrupt of step 1
    val interrupted = new java.util.concurrent.CountDownLatch(1)
    val boom = new IllegalStateException("step 0 failed")
    val thrown = intercept[IllegalStateException] {
      TableViews.stepConcurrently(4) { parSteps =>
        parSteps(Seq(
          () => { Thread.sleep(50L); throw boom },
          () => {
            try new java.util.concurrent.CountDownLatch(1).await()
            catch { case _: InterruptedException =>
              interrupted.countDown(); throw new RuntimeException }
            (): Any
          }))
      }
    }
    assert(thrown eq boom)
    assert(interrupted.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "blocked sibling was not cancelled on failure")
  }

  test("steps see the passed session as the thread-local active session") {
    // pool threads don't inherit the replay thread's Spark thread-locals;
    // the helper must install the child session so a step reaching for
    // SparkSession.active binds the session its ctx frames live in
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "3")
    var seen: Seq[Any] = Seq.empty
    TableViews.stepConcurrently(2, Some(child)) { parSteps =>
      seen = parSteps(Seq(
        () => org.apache.spark.sql.SparkSession.active
          .conf.get("spark.sql.shuffle.partitions"): Any,
        () => (org.apache.spark.sql.SparkSession.active eq child): Any))
    }
    assert(seen == Seq("3", true),
      s"steps bound the wrong active session: $seen")
  }
}
