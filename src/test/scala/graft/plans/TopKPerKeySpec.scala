package graft.plans

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkTestBase {

  private def viaExec = TopKPerKey(
    Tables.orders(spark, sf0001).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
    keys = Seq("o_custkey"),
    order = Seq("o_totalprice" -> false, "o_orderkey" -> true),
    k = 3)

  test("custom exec matches the window row_number formulation exactly") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
    assertSameRows(viaExec, viaWindow)
  }

  test("plans as TopKPerKeyExec over one exchange, with NO sort") {
    val df = viaExec
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), plan) // exec nodeName strips the Exec suffix
    assert(!plan.contains("Sort "), "the heap should replace the sort\n" + plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
  }

  test("keys with fewer than k rows emit all their rows") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val got = TopKPerKey(df, Seq("k"), Seq("v" -> false), 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 10.0), (1L, 20.0), (2L, 5.0)))
  }
}
