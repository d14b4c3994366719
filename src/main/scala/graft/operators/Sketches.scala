package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Mergeable-sketch operators — the pre-aggregation pattern that makes
  * distinct-count rollups cheap at 100 TB: build a fixed-size sketch once
  * per fine-grained group, then MERGE sketches (bytes, not data) to every
  * coarser grain. Re-scanning the fact table per rollup level is the thing
  * this avoids; a day→month→year rollup touches the data exactly once.
  *
  * Uses Spark's built-in Apache DataSketches HLL functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) — codegen'd
  * aggregates with partial (map-side) merge, so the shuffle carries one
  * ~2^lgK-byte sketch per group, never the value stream.
  */
object Sketches {

  /** Distinct-count rollup via mergeable HLL sketches: one sketch per
    * (coarse, fine) group, unioned — never rebuilt — to the coarse grain.
    * Returns (coarse, approx_distinct). The two-level groupBy is the
    * point: the second aggregation's input is |fine groups| sketch rows,
    * so adding rollup levels costs sketch-merge time, not another pass
    * over the fact table. Standard error ≈ 1.04/√2^lgK (~1.6% at the
    * default lgK=12). */
  def hllDistinctRollup(df: DataFrame, fine: Column, coarse: Column,
                        value: Column, lgK: Int = 12): DataFrame =
    df.groupBy(coarse.as("coarse"), fine.as("fine"))
      .agg(hll_sketch_agg(value, lit(lgK)).as("sk"))
      .groupBy(col("coarse"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("approx_distinct"))

  /** Frequency rollup via mergeable Count-Min sketches — the per-item-count
    * twin of [[hllDistinctRollup]]: one `depth×width` counter table per fine
    * group (Spark's native `count_min_sketch` aggregate — codegen-planned,
    * map-side partial merge), then ONE merged sketch per coarse grain via
    * [[graft.functions.CmsMergeAgg]] (counter tables add cell-wise; merge is
    * exact). Returns (coarse, sk) — probe it with
    * [[graft.functions.cms_estimate]] for any item, no fact rescans.
    *
    * Sizing: width ⌈e/ε⌉, depth ⌈ln(1/δ)⌉; estimate ≥ truth always, and
    * ≤ truth + ε·N with prob ≥ 1−δ. At ε=10⁻⁴/δ=0.01 a sketch is ~1 MB —
    * per GROUP, regardless of N: the 100 TB story is that a month→all-time
    * frequency dashboard merges |days| megabyte blobs instead of re-counting
    * 10¹² rows. The seed is explicit: merge REQUIRES equal seeds, and a
    * deterministic seed makes estimates replayable for the oracle gate. */
  def cmsFrequencyRollup(df: DataFrame, fine: Column, coarse: Column,
                         value: Column, eps: Double, confidence: Double,
                         seed: Int): DataFrame =
    df.groupBy(coarse.as("coarse"), fine.as("fine"))
      .agg(count_min_sketch(value, lit(eps), lit(confidence), lit(seed)).as("sk"))
      .groupBy(col("coarse"))
      .agg(graft.functions.cms_merge_agg(col("sk")).as("sk"))

  /** Quantile rollup via mergeable KLL sketches — the percentile twin of
    * [[hllDistinctRollup]], on Spark 4's native DataSketches KLL binding
    * (`kll_sketch_agg_double` / `kll_merge_agg_double` /
    * `kll_sketch_get_quantile_double` — codegen-registered aggregates
    * with map-side partial merge; a custom `TypedImperativeAggregate`
    * would only re-implement what these ship): one ~3KB sketch per
    * (coarse, fine) group, then the coarse grain MERGES sketch bytes
    * (one shuffle of |fine groups| fixed-size blobs), never re-scanning
    * values. Returns both grains, each with a column per requested rank
    * (`p50`, `p90`, …) — a day→month→year percentile dashboard touches
    * the data once. KLL's normalized rank error is ~1.65% at the default
    * k=200 (Karnin–Lang–Liberty, FOCS 2016). */
  def kllQuantileRollup(df: DataFrame, fine: Column, coarse: Column,
                        value: Column, ranks: Seq[Double], k: Int = 200)
      : (DataFrame, DataFrame) = {
    def qCols(ranks: Seq[Double]) = ranks.map { r =>
      kll_sketch_get_quantile_double(col("sk"), lit(r)).as(s"p${math.round(r * 100)}")
    }
    val fineSk = df.groupBy(coarse.as("coarse"), fine.as("fine"))
      .agg(kll_sketch_agg_double(value, k).as("sk"))
    val fineQ = fineSk.select(
      Seq(col("coarse"), col("fine")) ++ qCols(ranks): _*)
    val coarseQ = fineSk.groupBy(col("coarse"))
      .agg(kll_merge_agg_double(col("sk"), k).as("sk"))
      .select(col("coarse") +: qCols(ranks): _*)
    (fineQ, coarseQ)
  }
}
