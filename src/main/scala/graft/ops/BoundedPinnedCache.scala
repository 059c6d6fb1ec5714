package graft.ops

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Size-bounded memo of PINNED per-(session, key) states — the one
  * implementation behind every shared-state cache (CdcQueries'
  * SharedJoin replay results, SharedCorpus's token/signature frames).
  *
  * Semantics:
  *  - `get` returns the cached value or builds it under the map lock
  *    (builders are per-session warm-up work, so serializing them is
  *    the point — two racing queries must not replay twice).
  *  - At `maxEntries` the ELDEST entry is evicted and `release`d
  *    (explicitly dropping its pinned localCheckpoint blocks — the
  *    ContextCleaner would otherwise hold them until GC). An evicted
  *    value is UNUSABLE: callers must re-`get` per use rather than
  *    holding results across other cache-filling work.
  *  - Eviction and the application-end hook skip `release` when the
  *    owning SparkContext has already stopped — unpersisting against a
  *    stopped context throws into whatever unrelated query triggered
  *    the eviction.
  *  - The application-end listener is registered once PER CONTEXT (not
  *    per JVM): a test suite that stops one context and starts another
  *    still gets its entries dropped when the second one ends. */
private[graft] final class BoundedPinnedCache[V](maxEntries: Int = 8)
                                                (release: V => Unit) {

  // accessOrder = true: eviction is LRU, not insertion-ordered — the
  // first-built entry is usually the hottest (the orders replay every
  // cdc_* query reuses), and get() hits must refresh its recency
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String), V](16, 0.75f, true)
  private val hooked =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkContext, java.lang.Boolean]())

  private def safeRelease(s: SparkSession, v: V): Unit =
    if (!s.sparkContext.isStopped)
      try release(v)
      catch { case _: IllegalStateException => () /* racing stop */ }

  private def hookContext(s: SparkSession): Unit = {
    val sc = s.sparkContext
    if (hooked.put(sc, java.lang.Boolean.TRUE) == null)
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
            : Unit = m.synchronized {
          val it = m.entrySet().iterator()
          while (it.hasNext) {
            if (it.next().getKey._1.sparkContext eq sc) it.remove()
          }
        }
      })
  }

  def get(s: SparkSession, key: String)(build: => V): V = m.synchronized {
    val k = (s, key)
    val hit = m.get(k)
    if (hit != null) hit
    else {
      if (m.size >= maxEntries) {
        val it = m.entrySet().iterator()
        if (it.hasNext) {
          val eldest = it.next()
          safeRelease(eldest.getKey._1, eldest.getValue)
          it.remove()
        }
      }
      hookContext(s)
      val v = build
      m.put(k, v)
      v
    }
  }
}
