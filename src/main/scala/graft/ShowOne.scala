package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print a query's result rows (args = query names) on
  * SPARK_GRAFT_SF_DIR — the quickest way to eyeball a gate row. */
object ShowOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations = Seq(graft.plans.PushableKeyCast)
    spark.experimental.extraStrategies = Seq(graft.plans.TopKPerKeyStrategy)
    args.foreach { name =>
      println(s"=== $name ===")
      SparkEntry.queries(name)(spark, sfDir).show(50, truncate = false)
    }
    spark.stop()
  }
}
