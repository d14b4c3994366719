package graft.operators

import graft.SparkTestBase
import graft.functions.{kll_merge_agg, kll_quantile, kll_sketch_agg}
import org.apache.spark.sql.functions._

class KllSketchSpec extends SparkTestBase {

  test("kll sketch quantiles sit within the rank-error bound on a known stream") {
    import spark.implicits._
    // 1..10000 shuffled deterministically across partitions: true pX = X%·10000
    val df = (1 to 10000).map(i => (i * 7919) % 10007).filter(_ <= 10000)
      .toDF("v").repartition(8).select(col("v").cast("double").as("v"))
    val n = df.count().toDouble
    val got = df.agg(
      kll_quantile(kll_sketch_agg(col("v")), 0.5).as("p50"),
      kll_quantile(kll_sketch_agg(col("v")), 0.9).as("p90")).head()
    // rank-space check: observed inclusive rank of the estimate vs requested
    for ((q, est) <- Seq(0.5 -> got.getDouble(0), 0.9 -> got.getDouble(1))) {
      val rank = df.filter(col("v") <= est).count() / n
      assert(math.abs(rank - q) <= 0.02, s"rank($est)=$rank vs $q")
    }
  }

  test("merged sketches answer like a sketch of the union (rollup contract)") {
    import spark.implicits._
    val df = (1 to 8000).map(i => ((i % 4).toLong, ((i * 5407) % 9001).toDouble))
      .toDF("g", "v").repartition(8)
    // build per-group, merge to one — vs build once over everything
    val merged = df.groupBy(col("g")).agg(kll_sketch_agg(col("v")).as("sk"))
      .agg(kll_quantile(kll_merge_agg(col("sk")), 0.5).as("p50")).head().getDouble(0)
    val direct = df.agg(
      kll_quantile(kll_sketch_agg(col("v")), 0.5).as("p50")).head().getDouble(0)
    val n = df.count().toDouble
    val rankM = df.filter(col("v") <= merged).count() / n
    val rankD = df.filter(col("v") <= direct).count() / n
    assert(math.abs(rankM - 0.5) <= 0.02, s"merged rank $rankM")
    assert(math.abs(rankD - 0.5) <= 0.02, s"direct rank $rankD")
  }

  test("nulls are skipped; an empty sketch yields null quantile") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(3.0), None).toDF("v")
    val p = df.agg(kll_quantile(kll_sketch_agg(col("v")), 0.5)).head()
    assert(!p.isNullAt(0) && p.getDouble(0) >= 1.0 && p.getDouble(0) <= 3.0)
    val empty = df.filter(col("v") > 100).agg(
      kll_quantile(kll_sketch_agg(col("v")), 0.5)).head()
    assert(empty.isNullAt(0))
  }

  test("kllQuantileRollup emits both grains with per-rank columns") {
    import spark.implicits._
    // fine 0..9 nested under coarse 0..1 (fine determines coarse): 20 pairs
    val df = (1 to 2000).map { i =>
      ((i % 20) / 10, i % 20, ((i * 263) % 2003).toDouble)
    }.toDF("coarse_in", "fine_in", "v")
    val (fineQ, coarseQ) = Sketches.kllQuantileRollup(
      df, col("fine_in"), col("coarse_in"), col("v"), ranks = Seq(0.5, 0.9))
    assert(fineQ.columns.toSeq == Seq("coarse", "fine", "p50", "p90"))
    assert(coarseQ.columns.toSeq == Seq("coarse", "p50", "p90"))
    assert(fineQ.count() == 20 && coarseQ.count() == 2)
    // quantiles are ordered: p50 <= p90 everywhere
    assert(coarseQ.filter(col("p50") > col("p90")).count() == 0)
    assert(fineQ.filter(col("p50") > col("p90")).count() == 0)
  }
}
