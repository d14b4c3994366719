package graft.util

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[LoopConf]] contract: loop shuffles are sized to the measured loop
  * state (floored at 1, capped at the session default so a big loop is
  * never starved), and the scoped conf is always restored — even when the
  * loop body throws. */
class LoopConfSpec extends SparkTestBase {

  test("sizedParts: floor 1, volume-derived, capped at session default") {
    val session = spark.sessionState.conf.numShufflePartitions
    assert(LoopConf.sizedParts(spark, 0L) == 1)
    assert(LoopConf.sizedParts(spark, 999999L) == 1)
    assert(LoopConf.sizedParts(spark, 1000000L * session * 10) == session)
  }

  test("withShuffleParts scopes and restores, also on throw") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    LoopConf.withShuffleParts(spark, 2) {
      assert(spark.conf.get(key) == "2")
    }
    assert(spark.conf.get(key) == prev)
    intercept[RuntimeException] {
      LoopConf.withShuffleParts(spark, 3) { throw new RuntimeException("x") }
    }
    assert(spark.conf.get(key) == prev)
  }

  test("an iterative operator leaves the session conf untouched") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val edges = spark.range(0, 20).select(
      concat(lit("n"), (col("id") % 7).cast("string")).as("src"),
      concat(lit("n"), ((col("id") + 1) % 7).cast("string")).as("dst"))
    graft.operators.Graph.kCore(edges, 2).collect()
    assert(spark.conf.get(key) == prev)
  }
}
