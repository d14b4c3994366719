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

  test("key-equality filter is pushed: one page planned, one row returned") {
    val df = users(2000, pageSize = 250).where(col("id") === "user-777")
    val got = df.collect()
    assert(got.length == 1 && got(0).getAs[String]("id") == "user-777")
    // page 777/250 = 3 is the only planned partition
    assert(df.rdd.getNumPartitions == 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
  }

  test("pushed filter with an unknown or malformed key plans zero pages") {
    assert(users(2000).where(col("id") === "user-99999").rdd.getNumPartitions == 0)
    assert(users(2000).where(col("id") === "nonsense").rdd.getNumPartitions == 0)
    assert(users(2000).where(col("id") === "user-99999").count() == 0)
  }

  test("non-canonical key literals match nothing (the filter is CONSUMED, not re-checked)") {
    // the scan reports the equality as pushed, so Spark never re-applies
    // it — a loose parse of 'user-007' (→ 7) would return row user-7 for a
    // predicate no row satisfies. Only exact round-trips plan a page.
    for (bad <- Seq("user-007", "user-+7", "user- 7", "user-7 ", "7")) {
      val df = users(2000).where(col("id") === bad)
      assert(df.rdd.getNumPartitions == 0, s"'$bad' must plan zero pages")
      assert(df.count() == 0, s"'$bad' must match no rows")
    }
    // and the canonical form still hits its single page
    assert(users(2000).where(col("id") === "user-7").count() == 1)
  }

  test("a failing page fails the job by default (fetch errors surface)") {
    val df = spark.read.format("graft-users")
      .option("rows", 1000).option("pageSize", 250)
      .option("failPages", "2").load()
    val e = intercept[org.apache.spark.SparkException](df.count())
    assert(e.getMessage.contains("simulated fetch failure") ||
      Option(e.getCause).exists(_.getMessage.contains("simulated fetch failure")))
  }

  test("per-page failure isolation: skip drops only the failing page") {
    val df = spark.read.format("graft-users")
      .option("rows", 1000).option("pageSize", 250)
      .option("failPages", "2").option("pageFailureMode", "skip").load()
    assert(df.count() == 750) // 4 pages minus the failed one
    // the failed page's id range is the gap; other pages intact
    assert(df.where(col("id") === "user-500").count() == 0)
    assert(df.where(col("id") === "user-499").count() == 1)
  }

  test("per-page failure isolation: fallback substitutes the static dataset") {
    val df = spark.read.format("graft-users")
      .option("rows", 1000).option("pageSize", 250)
      .option("failPages", "1,3").option("pageFailureMode", "fallback").load()
    assert(df.count() == 500 + 6) // 2 good pages + 3 fallback rows per failed page
    val fb = df.where(col("id").startsWith("fallback-")).collect()
    assert(fb.length == 6)
    assert(fb.exists(_.getAs[String]("name") == "Alice Anderson"))
  }

  test("pushed key filter holds on fallback pages (no unfiltered rows leak)") {
    // the id filter is CONSUMED by the scan, so the fallback branch must
    // honor it: a point lookup on a failed page correctly finds nothing
    // (fallback ids can never match a user-<n> key)
    val df = spark.read.format("graft-users")
      .option("rows", 1000).option("pageSize", 250)
      .option("failPages", "2").option("pageFailureMode", "fallback").load()
    assert(df.where(col("id") === "user-500").count() == 0) // page 2 failed
    assert(df.where(col("id") === "user-10").count() == 1)  // page 0 fine
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
