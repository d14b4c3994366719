package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** KLL quantile + theta set sketches (Spark 4's native DataSketches
  * bindings — the engine uses builtins here rather than re-implementing
  * the aggregates; these specs pin the semantics the kll1/theta1 gates
  * rely on). */
class KllSketchSpec extends SparkTestBase {

  test("kll sketch quantiles sit within the rank-error bound on a known stream") {
    import spark.implicits._
    // 1..10000 shuffled deterministically across partitions: true pX = X%·10000
    val df = (1 to 10000).map(i => (i * 7919) % 10007).filter(_ <= 10000)
      .toDF("v").repartition(8).select(col("v").cast("double").as("v"))
    val n = df.count().toDouble
    val got = df.agg(
      kll_sketch_get_quantile_double(kll_sketch_agg_double(col("v"), 200), lit(0.5)).as("p50"),
      kll_sketch_get_quantile_double(kll_sketch_agg_double(col("v"), 200), lit(0.9)).as("p90")).head()
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
    val merged = df.groupBy(col("g")).agg(kll_sketch_agg_double(col("v"), 200).as("sk"))
      .agg(kll_sketch_get_quantile_double(
        kll_merge_agg_double(col("sk"), 200), lit(0.5)).as("p50")).head().getDouble(0)
    val direct = df.agg(kll_sketch_get_quantile_double(
      kll_sketch_agg_double(col("v"), 200), lit(0.5)).as("p50")).head().getDouble(0)
    val n = df.count().toDouble
    val rankM = df.filter(col("v") <= merged).count() / n
    val rankD = df.filter(col("v") <= direct).count() / n
    assert(math.abs(rankM - 0.5) <= 0.02, s"merged rank $rankM")
    assert(math.abs(rankD - 0.5) <= 0.02, s"direct rank $rankD")
  }

  test("kllQuantileRollup emits both grains with per-rank columns") {
    import spark.implicits._
    // fine 0..19 nested under coarse 0..1 (fine determines coarse): 20 pairs
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

  test("theta intersection recovers a known overlap exactly in sub-nominal mode") {
    import spark.implicits._
    // A = 1..600, B = 401..1000: |A∩B| = 200, |A∪B| = 1000 — both sides far
    // below 2^12 nominal entries, so estimates must be EXACT
    val df = ((1 to 600).map(v => ("a", v.toLong)) ++
      (401 to 1000).map(v => ("b", v.toLong))).toDF("s", "v").repartition(8)
    val sk = df.groupBy(col("s")).agg(theta_sketch_agg(col("v")).as("sk"))
    val inter = sk.as("x").join(sk.as("y"), col("x.s") < col("y.s"))
      .select(theta_sketch_estimate(
        theta_intersection(col("x.sk"), col("y.sk"))).as("est")).head().getLong(0)
    assert(inter == 200L, s"intersection $inter")
    val all = sk.agg(theta_sketch_estimate(theta_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    assert(all == 1000L, s"union $all")
    // disjoint sets intersect to zero
    val dj = ((1 to 100).map(v => ("a", v.toLong)) ++
      (201 to 300).map(v => ("b", v.toLong))).toDF("s", "v")
      .groupBy(col("s")).agg(theta_sketch_agg(col("v")).as("sk"))
    val zero = dj.as("x").join(dj.as("y"), col("x.s") < col("y.s"))
      .select(theta_sketch_estimate(
        theta_intersection(col("x.sk"), col("y.sk"))).as("est")).head().getLong(0)
    assert(zero == 0L)
  }

  test("theta estimation mode stays inside the lgK error bound at 100k entries") {
    import spark.implicits._
    // 100k distinct values >> 2^12 nominal: estimation mode; relative
    // standard error ≈ 1/√2^12 ≈ 1.6%, assert a generous 5σ envelope
    val df = (1 to 100000).map(_.toLong).toDF("v").repartition(16)
    val est = df.agg(theta_sketch_estimate(theta_sketch_agg(col("v"))).as("e"))
      .head().getLong(0).toDouble
    assert(math.abs(est - 100000.0) / 100000.0 <= 0.08, s"estimate $est")
  }
}
