package graft.plans

import graft.{SparkTestBase, Tables}
import graft.etl.Transform
import org.apache.spark.sql.functions._

class PushableKeyCastSpec extends SparkTestBase {

  test("loose-== key lookup becomes a pushed parquet predicate") {
    val df = Transform.pointLookup(Tables.orders(spark, sf0001), "o_orderkey", "42")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"), plan)
  }

  test("rewrite preserves string-comparison semantics") {
    import spark.implicits._
    val df = Seq(42L, 7L).toDF("k")
    // round-trips → rewritten, matches
    assert(df.filter($"k".cast("string") === "42").count() == 1)
    // '042' does NOT round-trip: must keep string semantics (no match)
    assert(df.filter($"k".cast("string") === "042").count() == 0)
    // non-numeric literal: untouched, no match, no crash
    assert(df.filter($"k".cast("string") === "x42").count() == 0)
    // reversed operand order also rewrites/matches
    assert(df.filter(lit("7") === $"k".cast("string")).count() == 1)
  }

  test("rule fires in the optimized logical plan") {
    import spark.implicits._
    val df = Seq(1L).toDF("k").filter($"k".cast("string") === "1")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cast("), optimized)
  }
}
