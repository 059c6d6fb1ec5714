package graft

/** Stage-listener probe for the measured-in-miniature scale specs:
  * total + max-per-stage SHUFFLE record volume while a block runs.
  * Shuffle records are the scale-sensitive metric for the maintained
  * views — full-state reads are pinned scan-side (broadcast-pruned,
  * never exchanged), so a corpus-sized stage shows up here and nowhere
  * else. Listener events are async: polled to quiescence. */
trait ShuffleProbe { self: SparkSpec =>
  /** The heaviest stages of the last probe window, `(records, stage
    * description)` — for failure messages that NAME the corpus-sized
    * exchange instead of just counting it. */
  @volatile var lastTopStages: Seq[(Long, String)] = Seq.empty

  def shuffleRecordsDuring(work: => Unit): (Long, Long) = {
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxStage = new java.util.concurrent.atomic.AtomicLong(0L)
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          val rec = m.shuffleReadMetrics.recordsRead +
            m.shuffleWriteMetrics.recordsWritten
          total.addAndGet(rec)
          maxStage.getAndUpdate(cur => math.max(cur, rec))
          if (rec > 0)
            stages.add((rec, sc.stageInfo.name +
              " @ " + sc.stageInfo.details.linesIterator
                .filterNot(_.contains("org.apache.spark."))
                .take(3).mkString(" <- ")))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      work
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) {
        Thread.sleep(100)
        waited += 1
        if (total.get == last) stable += 1 else { stable = 0; last = total.get }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    lastTopStages = stages.asScala.toSeq.sortBy(-_._1).take(5)
    (total.get, maxStage.get)
  }
}
