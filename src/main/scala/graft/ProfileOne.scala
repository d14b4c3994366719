package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool (guide §1): per-query execution-shape profile. For each named
  * query, after the standard sf0.001 warmup, runs the query once on
  * SPARK_GRAFT_SF_DIR through the noop sink with a listener attached and
  * prints `PROFILE <name> wall=… jobs=… stages=… tasks=… taskTime=…
  * shufRead=… shufWrite=… input=…` — the numbers that separate
  * "scheduling/barrier-bound" (wall >> taskTime/cores, many jobs) from
  * "compute-bound" (taskTime ≈ wall × cores) before any optimization is
  * attempted. */
object ProfileOne {
  private class Acc extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shufReadB = new AtomicLong
    val shufWriteB = new AtomicLong
    val inputB = new AtomicLong
    val gcMs = new AtomicLong
    // SPARK_GRAFT_JOB_TRACE=1: print each job's start offset + call site —
    // the per-job breakdown behind "which action owns the job count"
    private val trace = sys.env.get("SPARK_GRAFT_JOB_TRACE").contains("1")
    @volatile var t0 = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val n = jobs.incrementAndGet()
      if (trace) {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        val nStages = j.stageInfos.size
        println(f"JOB $n%3d +${(System.nanoTime() - t0) / 1e9}%.2fs stages=$nStages $site")
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputB.addAndGet(m.inputMetrics.bytesRead)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations = Seq(graft.plans.PushableKeyCast)
    spark.experimental.extraStrategies = Seq(graft.plans.TopKPerKeyStrategy)
    args.foreach { name =>
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      System.gc()
      val t0 = System.nanoTime()
      acc.t0 = t0
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the listener bus (private API): poll until counters settle
      var last = -1
      while (acc.tasks.get != last) { last = acc.tasks.get; Thread.sleep(200) }
      spark.sparkContext.removeSparkListener(acc)
      println(f"PROFILE $name wall=$wall%.3f jobs=${acc.jobs.get}" +
        f" stages=${acc.stages.get} tasks=${acc.tasks.get}" +
        f" taskTime=${acc.taskTimeMs.get / 1e3}%.2f gc=${acc.gcMs.get / 1e3}%.2f" +
        f" shufRead=${acc.shufReadB.get / 1e6}%.1fMB" +
        f" shufWrite=${acc.shufWriteB.get / 1e6}%.1fMB" +
        f" input=${acc.inputB.get / 1e6}%.1fMB")
    }
    spark.stop()
  }
}
