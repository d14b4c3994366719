package graft

import org.apache.spark.sql.functions._

/** Bucketing deletes the biggest shuffle (SCALE.md): two tables bucketed on
  * the join key sort-merge-join without any Exchange. */
class BucketingSpec extends SparkTestBase {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // DROP TABLE clears the (session-local) catalog but a previous JVM's
    // warehouse directory survives on disk — remove it or CTAS refuses
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("li_b", "o_b").foreach { t =>
      val dir = new java.io.File(warehouse, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
    // disable broadcast so the join strategy itself is under test
    withBroadcastOff {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      val exchangesBeforeAgg = plan.linesIterator
        .takeWhile(!_.contains("SortMergeJoin")).count(_.contains("Exchange"))
      // the join inputs read pre-bucketed: no Exchange below the join
      assert(!plan.split("SortMergeJoin")(1).contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(exchangesBeforeAgg <= 1, plan) // only the post-join agg shuffles
    }
  }

  test("s2_dynamic_prune: fact scan carries a runtime partition filter") {
    val df = Queries.s2DynamicPrune(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
    // and the result equals the unpartitioned formulation
    val direct = Tables.orders(spark, sf0001)
      .filter(year(col("o_orderdate")) % 2 === 1)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_orderyear"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
    assertSameRows(df, direct)
  }

  test("q3_bucketed: full query plans with zero hash exchanges, matches q3") {
    val bucketed = Queries.q3Bucketed(spark, sf0001)
    bucketed.collect()
    val plan = bucketed.queryExecution.executedPlan.toString
    // no shuffle anywhere: the join reuses the bucket layout, the agg's
    // leading key is the bucket key, and top-10 is TakeOrderedAndProject
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assertSameRows(bucketed, Queries.q3Priority(spark, sf0001))
  }

  private def withBroadcastOff[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
    }
  }
}
