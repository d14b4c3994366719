package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staged Extract→Transform→Load runner with real run analytics.
  *
  * The reference tracks stage status (`pending/active/done`,
  * pages/index.js:38,60-77), an append-only run log (src/mock-data/etl.json:
  * 9-13) and a hardcoded `duration_sec: 95` (users.js:75). Here stages are
  * named DataFrame transformations, the log is a real DataFrame
  * `(ts, stage, message)`, and durations are measured wall-clock per stage —
  * the "аналитика выполнения" done honestly.
  *
  * Stage composition stays lazy: a stage contributes its transformation to
  * the plan; only terminal actions (the Load stage) execute. Timings therefore
  * attribute plan-construction to stages and execution to the action — which
  * is the correct mental model for Spark, and what the log records.
  */
final case class StageRun(stage: String, status: String, durationSec: Double, rows: Long)

class Pipeline(spark: SparkSession) {
  import spark.implicits._

  private val logBuf = scala.collection.mutable.ArrayBuffer.empty[(java.sql.Timestamp, String, String)]
  private val stages = scala.collection.mutable.ArrayBuffer.empty[StageRun]

  private def logLine(stage: String, msg: String): Unit =
    logBuf += ((new java.sql.Timestamp(System.currentTimeMillis()), stage, msg))

  /** Run one named stage; counts rows (an action) so per-stage row metrics
    * mirror the reference's rows_in/rows_out accounting. */
  def stage(name: String, df: => DataFrame): DataFrame = {
    logLine(name, s"stage $name started")
    val t0 = System.nanoTime()
    val out = df
    val rows = out.count()
    val dt = (System.nanoTime() - t0) / 1e9
    stages += StageRun(name, "done", dt, rows)
    logLine(name, f"stage $name done: $rows rows in $dt%.3f s")
    out
  }

  def log: DataFrame = logBuf.toSeq.toDF("ts", "stage", "message")
  def runs: Seq[StageRun] = stages.toSeq
  def totalDurationSec: Double = stages.map(_.durationSec).sum
}
