package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def facts = (1L to 2000L).map { i =>
    // 4 coarse groups × 5 fine groups; distinct values overlap across
    // fine groups within a coarse group, so the union must actually merge
    (i % 4, i % 20, s"v${i % 500}")
  }.toDF("coarse_k", "fine_k", "v")

  test("rolled-up sketch estimate equals the direct coarse-grain sketch") {
    // HLL union is exact over sketch state: merging per-fine sketches must
    // yield byte-identical estimates to sketching the coarse group directly
    val rolled = Sketches.hllDistinctRollup(
      facts, col("fine_k"), col("coarse_k"), col("v"))
    val direct = facts.groupBy(col("coarse_k").as("coarse"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12)))
        .as("approx_distinct"))
    assertSameRows(rolled, direct)
  }

  test("estimates land within 5% of exact distinct counts") {
    val est = Sketches.hllDistinctRollup(
      facts, col("fine_k"), col("coarse_k"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = facts.groupBy("coarse_k").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k) - ex).toDouble / ex <= 0.05,
        s"group $k: est ${est(k)} vs exact $ex")
    }
  }
}
