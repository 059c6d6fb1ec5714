package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's self-grading: `contaminated` condemns a record
  * only when load straddled the WHOLE run, while `suspect` must catch
  * the round-15 blind spot — load arriving mid-run that inflates one
  * pass while both endpoint sentinels stay quiet. */
class BenchGuardSpec extends AnyFunSuite {

  private val ref = 0.15

  test("quiet box: neither flag") {
    // jitter under the 1.5x line must not flag
    val (c, s) = Bench.contamination(Seq(0.12, 0.16, 0.14), ref)
    assert(!c && !s)
  }

  test("sustained load across the whole run: contaminated AND suspect") {
    val (c, s) = Bench.contamination(Seq(0.40, 0.55, 0.38), ref)
    assert(c && s)
  }

  test("synthetic mid-run load: suspect but not contaminated") {
    // the r15 official record's shape: load lands between the passes
    // (or during one of them) and is gone by the other samples —
    // min-of-endpoints misses it entirely; the record must self-mark
    val (c1, s1) = Bench.contamination(Seq(0.06, 0.42, 0.07), ref)
    assert(!c1 && s1, "mid-run spike must mark the record suspect")
    // one-sided endpoint drift (r15's own sentinel_after = 1.85x ref)
    val (c2, s2) = Bench.contamination(Seq(0.057, 0.10, 0.277), ref)
    assert(!c2 && s2, "one drifted endpoint must mark the record suspect")
  }

  test("exactly at the line: not flagged (strict inequality)") {
    val (c, s) = Bench.contamination(Seq(1.5 * ref, 1.5 * ref), ref)
    assert(!c && !s)
  }

  test("build window bracket: prebuild drift alone marks build_suspect") {
    // the round-16 blind spot: load confined to the state/corpus build
    // window (prebuild sample hot, before-pass sample already quiet)
    // inflates state_build_sec while every PASS sentinel reads clean —
    // the build bracket is (prebuild, before) under ANY-sample
    // semantics, exactly Bench's build_suspect computation
    val (_, hotEntry) = Bench.contamination(Seq(0.40, 0.12), ref)
    assert(hotEntry, "a hot prebuild sample must mark the build window")
    // load arriving DURING the build and still present at pass start
    val (_, hotExit) = Bench.contamination(Seq(0.12, 0.40), ref)
    assert(hotExit, "a hot before-pass sample must mark the build window")
    val (_, quiet) = Bench.contamination(Seq(0.12, 0.14), ref)
    assert(!quiet)
  }
}
