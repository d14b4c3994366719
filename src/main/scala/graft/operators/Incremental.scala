package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates.
  *
  * A 100 TB fact table's rollup is never recomputed by rescan — the
  * matview is maintained by merging the stored aggregate with the
  * aggregate of the day's delta: `view ⊎ agg(Δ)` costs |Δ| + |view|
  * instead of |fact|. Counts and sums are distributive, so the merge is a
  * keyed full-outer join + coalesced addition; deletes ride the same path
  * as retractions (negative counts/sums), and a key whose maintained
  * count reaches zero leaves the view — the standard retractable-stream
  * algebra (same ⊎ that [[Sketches]] exploits for HLL/KLL rollups, here
  * for exact longs).
  *
  * Correctness is algebraic — `agg(base) ⊎ agg(Δ) = agg(base ∪ Δ)` holds
  * EXACTLY because the measures are integer counts and cent-longs
  * (order-free, associative); the ivm1 oracle runs the full-scan
  * aggregate and hash-matches the merged view against it. Scale shape:
  * both inputs arrive pre-aggregated (map-side combined), the join
  * shuffles only (key, measures) rows, and AQE reuses the delta side's
  * partitioning when the view is stored bucketed on the key.
  */
object Incremental {

  /** Merge a stored aggregate with a delta aggregate: same `keyCols` and
    * measure columns on both sides, measures added (missing side = 0),
    * keys whose maintained `countCol` drops to ≤ 0 removed. */
  def mergeAggDeltas(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
                     countCol: String, sumCols: Seq[String]): DataFrame = {
    val measures = countCol +: sumCols
    val b = measures.foldLeft(base) { (df, c) => df.withColumnRenamed(c, s"_b_$c") }
    val d = measures.foldLeft(delta) { (df, c) => df.withColumnRenamed(c, s"_d_$c") }
    val merged = b.join(d, keyCols, "full_outer")
    val maintained = measures.map { c =>
      (coalesce(col(s"_b_$c"), lit(0L)) + coalesce(col(s"_d_$c"), lit(0L))).as(c)
    }
    merged.select(keyCols.map(col) ++ maintained: _*)
      .filter(col(countCol) > 0)
  }

  /** Incremental JOIN maintenance — the classic delta-join identity:
    *
    *   (A ∪ ΔA) ⋈ (B ∪ ΔB) = (A ⋈ B) ∪ [ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB]
    *
    * so a stored join view absorbs a day's inserts by computing only the
    * bracketed delta — cost ∝ |Δ|·selectivity, never |A|·|B|. Each output
    * row is tagged with the term that produced it (`da_b`, `a_db`,
    * `da_db`), which is what a downstream retraction/compaction step keys
    * on. Inputs must be disjoint from their deltas (the insert-only IVM
    * contract; deletes ride [[mergeAggDeltas]]-style retractions at the
    * aggregate layer).
    *
    * Scale shape: ΔA and ΔB are delta-sized → Spark broadcasts them into
    * the two base-side joins (the base tables stream map-side, never
    * shuffling), and ΔA ⋈ ΔB is delta × delta. The base-⋈-base term —
    * the expensive one — is precisely what incremental maintenance never
    * recomputes. */
  def deltaJoin(baseA: DataFrame, deltaA: DataFrame,
                baseB: DataFrame, deltaB: DataFrame,
                joinKeys: Seq[String]): DataFrame = {
    def term(l: DataFrame, r: DataFrame, tag: String) =
      l.join(r, joinKeys).withColumn("delta_term", lit(tag))
    term(deltaA, baseB, "da_b")
      .unionByName(term(baseA, deltaB, "a_db"))
      .unionByName(term(deltaA, deltaB, "da_db"))
  }
}
