package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UsersApiSourceSpec extends SparkTestBase {

  private def users(rows: Int, pageSize: Int = 500) =
    spark.read.format("graft-users")
      .option("rows", rows).option("pageSize", pageSize).load()

  test("reads the requested number of deterministic rows") {
    val df = users(1234)
    assert(df.count() == 1234)
    val first = df.where(col("id") === "user-0").collect()(0)
    assert(first.getAs[String]("email") == "") // every 7th email empty (F1 case)
    assert(!first.getAs[Boolean]("valid"))
  }

  test("parallelism: one input partition per page") {
    val df = users(1000, pageSize = 100)
    assert(df.rdd.getNumPartitions == 10)
  }

  test("column pruning is pushed into the scan") {
    val df = users(100).select("id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=id"), plan) // scan description shows pruned set
  }

  test("feeds the E1 pipeline shape end-to-end (extract → filter → metrics)") {
    val df = users(700)
    val m = graft.etl.Metrics.summary(df,
      col("valid") && col("email") =!= "", col("country"), col("name"), col("id"))
      .collect()(0)
    assert(m.getAs[Long]("rows_in") == 700)
    assert(m.getAs[Long]("rows_out") == 600) // 100 invalid (every 7th)
    assert(m.getAs[Long]("countries") == 8)
  }
}
