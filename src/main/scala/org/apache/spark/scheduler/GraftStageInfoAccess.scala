package org.apache.spark.scheduler

/** Accessor for [[StageInfo.shuffleDepId]], which is `private[spark]`:
  * the id of the shuffle a submitted stage exists to WRITE (None for
  * result stages). graft.util.ShuffleBill counts distinct ids to
  * measure how many shuffles a query actually paid — the public
  * alternatives all mismeasure: stage−job arithmetic breaks under AQE
  * (each materialized query stage is its own job), and
  * shuffle-write-metrics filtering drops legitimately empty shuffles.
  * This is the only member accessed; nothing is re-exported. */
object GraftStageInfoAccess {
  def shuffleDepId(si: StageInfo): Option[Int] = si.shuffleDepId
}
