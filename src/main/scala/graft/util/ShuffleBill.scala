package graft.util

import org.apache.spark.scheduler.{GraftStageInfoAccess, SparkListener,
  SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** MEASURED shuffle accounting: how many distinct shuffles a piece of
  * work actually paid, counted from the scheduler, not read off a plan
  * string. This is the observable behind COST.md's per-stage "bills":
  * a static `explain` undercounts work that runs during DataFrame
  * CONSTRUCTION (eager `localCheckpoint` stage boundaries, the CC
  * fixpoint's per-round actions) and overcounts exchanges AQE reuses —
  * the scheduler's stage stream sees exactly what executed.
  *
  * Counting rule: a stage with `shuffleDepId = Some(id)` is the map
  * stage WRITING shuffle `id` (via [[GraftStageInfoAccess]] — the field
  * is `private[spark]`); distinct ids = shuffles paid. A reused
  * exchange (same shuffle id — AQE stage reuse, skipped stages) is
  * counted once: reuse is precisely "not paying again". Broadcast
  * exchanges create no shuffle dependency and are deliberately out of
  * scope — the bills this pins are the corpus-sized byte streams, and a
  * broadcast's cost is its (bounded, asserted-elsewhere) build side. */
object ShuffleBill {
  /** Run `body` and return the number of distinct shuffles its jobs
    * submitted map stages for. The listener bus is asynchronous and its
    * public API has no drain hook, so after `body` returns the count is
    * polled to stability (two consecutive 100 ms reads with no growth —
    * all jobs have completed by then, only event delivery can lag). */
  def measure(spark: SparkSession)(body: => Unit): Int = {
    val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onStageSubmitted(ev: SparkListenerStageSubmitted): Unit =
        GraftStageInfoAccess.shuffleDepId(ev.stageInfo).foreach(ids.add(_))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var last = -1
      var stable = 0
      while (stable < 2) {
        if (ids.size == last) stable += 1
        else { stable = 0; last = ids.size }
        if (stable < 2) Thread.sleep(100)
      }
      ids.size
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
