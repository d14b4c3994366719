package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dump `explain("formatted")` of every headline query to
  * docs/plans/<name>.txt — the evidence behind SCALE.md's claims. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "docs/plans"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations = Seq(graft.plans.PushableKeyCast)
    spark.experimental.extraStrategies = Seq(graft.plans.TopKPerKeyStrategy)
    Files.createDirectories(outDir)
    // SPARK_GRAFT_ONLY=a,b,c limits the dump (same contract as Verify);
    // unknown names fail loudly rather than silently writing nothing
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val benchable = (Queries.benchNames ++ Queries.retiredBenchNames ++
      Queries.shipLineNames).distinct
    // an explicit ONLY may name any REGISTERED query (the Bench ONLY
    // rule: verify-tier plans are dumpable without joining the default
    // set); the default dump stays bench rows + ship-line compositions
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not registered queries: ${unknown.mkString(", ")}")
    }
    val dumpable = (benchable ++
      (SparkEntry.queries.keySet -- benchable.toSet).toSeq.sorted)
    dumpable.filter(n => only match {
      case Some(sel) => sel.contains(n)
      case None      => benchable.contains(n) &&
        (!Queries.retiredBenchNames.contains(n) ||
          Queries.shipLineNames.contains(n))
    }).foreach { name =>
      // ship-line compositions materialize stage boundaries with eager
      // localCheckpoint, so their stage exchanges run at CONSTRUCTION
      // time and never appear in the final static plan — the committed
      // dump carries the MEASURED bill (distinct shuffles executed,
      // scheduler-counted) alongside the plan text
      var df: org.apache.spark.sql.DataFrame = null
      val bill = graft.util.ShuffleBill.measure(spark) {
        df = Queries.all(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save() // finalize AQE
      }
      val billLine =
        if (Queries.shipLineNames.contains(name))
          s"== measured shuffle bill (distinct shuffles executed, incl. stage materialization) ==\n$bill\n"
        else ""
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val adaptive = df.queryExecution.executedPlan.toString
      // giant inline literals (e.g. a serialized Bloom filter rendered as
      // hex) would bloat a dump to MBs without adding plan information —
      // elide anything a reader wouldn't scan anyway
      val elided = s"$billLine== explain(formatted), $sfDir ==\n$formatted\n== executed (AQE final) ==\n$adaptive\n"
        .linesIterator.map { l =>
          if (l.length <= 800) l
          else l.take(800) + s"… [${l.length - 800} chars elided]"
        }.mkString("\n")
      Files.writeString(outDir.resolve(s"$name.txt"), elided)
      println(s"PLAN $name written")
    }
    spark.stop()
  }
}
