package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries (args = query names) on
  * SPARK_GRAFT_SF_DIR with the same warmup + gc hygiene as [[Bench]].
  * Prints `TIME <name> <sec>` per rep so A/B runs are one grep away. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      // A/B knobs for optimization experiments only; Bench stays pinned
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_WSCG", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations = Seq(graft.plans.PushableKeyCast)
    spark.experimental.extraStrategies = Seq(graft.plans.TopKPerKeyStrategy)
    args.foreach { name =>
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      (1 to reps).foreach { _ =>
        System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
