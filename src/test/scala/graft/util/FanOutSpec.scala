package graft.util

import graft.SparkTestBase

/** [[FanOut.scanParallel]] contract: fan a narrow scan out to the session's
  * default parallelism, be the identity (no added exchange) once the input's
  * own partition count reaches it, and never change row content. */
class FanOutSpec extends SparkTestBase {

  test("fans a single-partition frame out to defaultParallelism") {
    val df = spark.range(0, 1000).toDF("id").coalesce(1)
    val out = FanOut.scanParallel(df)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assertSameRows(df, out)
  }

  test("identity when the input already has >= defaultParallelism partitions") {
    val target = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 1000).toDF("id").repartition(target + 2)
    val out = FanOut.scanParallel(df)
    // same plan object — no exchange added on top of the wide input
    assert(out eq df)
  }

  test("parquet fixture scan fans out and keeps results identical") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = FanOut.scanParallel(docs)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assertSameRows(docs, out)
  }
}
