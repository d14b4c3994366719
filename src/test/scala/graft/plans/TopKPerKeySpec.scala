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

  test("high-cardinality keys spill to the sort-based path, result unchanged") {
    import spark.implicits._
    // ~200k distinct keys × 2 rows under a 1 MB budget: the heap map blows
    // the budget almost immediately, so virtually the whole input goes
    // through the UnsafeKVExternalSorter fallback — result must equal the
    // window formulation row-for-row
    val n = 200000
    val df = spark.range(n * 2).select(
      (col("id") % n).as("k"),
      (col("id") * 37 % 1000).cast("double").as("v"),
      col("id").as("tie"))
    spark.conf.set("spark.graft.topk.maxMemoryBytes", (1024 * 1024).toString)
    try {
      val viaHeap = TopKPerKey(df, Seq("k"), Seq("v" -> false, "tie" -> true), 1)
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("tie").asc)
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 1).drop("rn")
      assert(viaHeap.count() == n)
      assertSameRows(viaHeap, viaWindow)
    } finally spark.conf.unset("spark.graft.topk.maxMemoryBytes")
  }

  test("tiny budget and k larger than some groups still exact under spill") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 1L), (1L, 20.0, 2L), (1L, 30.0, 3L), (2L, 5.0, 4L))
      .toDF("k", "v", "tie")
    spark.conf.set("spark.graft.topk.maxMemoryBytes", "0") // force immediate spill
    try {
      val got = TopKPerKey(df, Seq("k"), Seq("v" -> false, "tie" -> true), 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((1L, 30.0), (1L, 20.0), (2L, 5.0)))
    } finally spark.conf.unset("spark.graft.topk.maxMemoryBytes")
  }

  test("keys with fewer than k rows emit all their rows") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val got = TopKPerKey(df, Seq("k"), Seq("v" -> false), 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 10.0), (1L, 20.0), (2L, 5.0)))
  }
}
