package graft.etl

import graft.SparkTestBase
import java.nio.file.Files

class LoadSpec extends SparkTestBase {
  import spark.implicits._

  test("K2 CSV export: quote-all with embedded-quote doubling, round-trips") {
    val df = Seq(("a \"quoted\" value", 1), ("plain", 2), (null.asInstanceOf[String], 3))
      .toDF("text", "n")
    val out = Files.createTempDirectory("graft-csv").toString
    Load.csv(df, out)
    val raw = Files.list(java.nio.file.Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".csv"))
      .flatMap(p => scala.io.Source.fromFile(p).getLines())
    assert(raw.exists(_.contains("\"a \"\"quoted\"\" value\"")), raw.mkString("|"))
    // round-trip through Spark's reader restores the original values
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .option("escape", "\"").csv(out)
    assert(back.where($"text" === "a \"quoted\" value").count() == 1)
  }

  test("partitioned parquet: key predicate prunes to partition directories") {
    val orders = graft.Tables.orders(spark, sf0001)
    val out = Files.createTempDirectory("graft-part").toString
    Load.partitionedParquet(orders, out, "o_orderpriority")
    // hive layout on disk
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("o_orderpriority=")) == 5, dirs.mkString(","))
    // a partition-key filter reaches the scan as a PartitionFilter — and
    // values round-trip
    val back = spark.read.parquet(out).filter($"o_orderpriority" === "1-URGENT")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderpriority"), plan)
    assert(back.count() ==
      orders.filter($"o_orderpriority" === "1-URGENT").count())
  }

  test("compact rewrites a many-file table into few files, rows unchanged") {
    val orders = graft.Tables.orders(spark, sf0001)
    val out = Files.createTempDirectory("graft-compact").resolve("t").toString
    orders.repartition(16).write.parquet(out)
    def parquetFiles = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles == 16)
    Load.compact(spark, out, 2)
    assert(parquetFiles == 2)
    assert(spark.read.parquet(out).count() == orders.count())
  }

  test("K1 JSON sink + K3 preview emit one object per row") {
    val df = Seq(("x", 1), ("y", 2)).toDF("k", "v")
    val out = Files.createTempDirectory("graft-json").toString
    Load.json(df, out)
    assert(spark.read.json(out).count() == 2)
    val preview = Load.previewJson(df, 1)
    assert(preview.length == 1 && preview.head.startsWith("{"))
  }

  test("K1 API envelope rejects an over-cap users frame loudly") {
    val users = (1 to 5).map(i => (i.toLong, s"u$i")).toDF("id", "name")
    val metrics = Seq((5L, 5L)).toDF("rows_in", "rows_out")
    val at = java.time.Instant.parse("2026-01-01T00:00:00Z")
    // at the cap: fine
    val ok = Load.apiEnvelope(users, metrics, fallbackUsed = false, at,
      maxRows = 5)
    assert(ok.contains(""""rows_in":5"""))
    // over the cap: throws instead of silently truncating / OOMing
    val e = intercept[IllegalArgumentException] {
      Load.apiEnvelope(users, metrics, fallbackUsed = false, at, maxRows = 4)
    }
    assert(e.getMessage.contains("maxRows"))
  }
}
