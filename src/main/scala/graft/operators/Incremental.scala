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
}
