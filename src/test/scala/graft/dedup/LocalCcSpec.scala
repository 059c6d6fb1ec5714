package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-18 driver-local connected-components fast path: under
  * `localEdgeCap` the edge set is labeled with a driver-side union-find
  * instead of the distributed propagation loop. These cases pin the
  * equivalence contract — the local labels must be BIT-IDENTICAL to the
  * distributed fixpoint (min member id per component) — by running the
  * same graphs through both paths (cap 0 forces the distributed loop). */
class LocalCcSpec extends SparkSpec {

  private def df(edges: Seq[(Long, Long)]) = {
    // union with a schema seed so an empty edge list still has columns
    val s = spark
    import s.implicits._
    edges.toDF("src", "dst")
  }

  private def sorted(r: org.apache.spark.sql.DataFrame) =
    r.orderBy(col("id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq

  /** Deterministic pseudo-random graph (LCG — no Random in tests that
    * must reproduce). */
  private def randomGraph(n: Int, m: Int, seed: Long): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    (1 to m).map { _ =>
      val a = math.floorMod(next(), n).toLong
      val b = math.floorMod(next(), n).toLong
      (a, b)
    }
  }

  test("local path == distributed path on random graphs (both variants)") {
    Seq(42L, 7L, 99L).foreach { seed =>
      val edges = randomGraph(n = 200, m = 300, seed)
      val local = sorted(
        Dedup.connectedComponents(df(edges), "src", "dst"))
      val dist = sorted(
        Dedup.connectedComponents(df(edges), "src", "dst",
                                  localEdgeCap = 0))
      assert(local == dist, s"min-label propagation parity (seed $seed)")
      val distLs = sorted(
        Dedup.connectedComponentsLogStar(df(edges), "src", "dst",
                                         localEdgeCap = 0))
      assert(local == distLs, s"log-star parity (seed $seed)")
    }
  }

  test("local path labels a long chain with its minimum id") {
    // 0-1-2-...-30 plus a disjoint triangle {100, 101, 102}
    val chain = (0L until 30L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (102L, 100L))
    val got = sorted(
      Dedup.connectedComponentsLogStar(df(chain ++ tri), "src", "dst"))
    assert(got == ((0L to 30L).map(i => (i, 0L)) ++
                   (100L to 102L).map(i => (i, 100L))))
  }

  test("local path handles self-loops, duplicates and an empty edge set") {
    val got = sorted(Dedup.connectedComponents(
      df(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L))), "src", "dst"))
    // the self-loop row is filtered (both variants always did); 5 emits
    // no label — singleton fill is the caller's, unchanged contract
    assert(got == Seq((1L, 1L), (2L, 1L)))
    assert(Dedup.connectedComponents(
      df(Seq.empty), "src", "dst").isEmpty)
  }

  test("union-find keeps the min root under adversarial merge order") {
    // merge high components first, then bridge to the global min last
    val edges = Seq((10L, 11L), (20L, 21L), (11L, 20L), (0L, 21L))
    val got = Dedup.connectedComponentsLocal(edges.toArray).toMap
    assert(got == Map(0L -> 0L, 10L -> 0L, 11L -> 0L, 20L -> 0L, 21L -> 0L))
  }
}
