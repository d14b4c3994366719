package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Implemented by composition (the preferred ladder rung before custom
  * plans): tag both sides, sort per key by event time with the right side
  * first at equal timestamps, and carry the latest right-side values
  * forward with `last(_, ignoreNulls)` over an unbounded-preceding window.
  * Each left row then holds the most recent right row with
  * `r.time <= l.time` — exactly ASOF JOIN semantics (DuckDB's native ASOF
  * is the oracle).
  *
  * Scale: one shuffle on the key + one sort — the same cost profile as a
  * sort-merge join, no per-row probing, no range cross product. State per
  * key during the window scan is O(carried columns).
  */
object AsOf {

  /** Left as-of join. `leftDf`/`rightDf` must share `keyCol` and `timeCol`;
    * the carried right-side payload columns are `carry`. */
  def asOfJoin(leftDf: DataFrame, rightDf: DataFrame,
               keyCol: String, timeCol: String,
               carry: Seq[String]): DataFrame = {
    val leftCols = leftDf.columns.filterNot(c => c == keyCol || c == timeCol)
    val l = leftDf.withColumn("_side", lit(1))
    val r = rightDf.withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right side sorts before left at equal time ⇒ same-instant rows match.
    // The carried columns join the ordering as a tiebreak: without it, two
    // right rows sharing (key, ts) would leave `last()` free to pick either
    // (partition-order nondeterminism). With it the pick is total-ordered:
    // the greatest carried tuple wins. Left rows carry nulls there, so
    // nulls-first keeps them ordered before nothing-in-particular.
    val tiebreak = carry.map(c => col(c).asc_nulls_first)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc +: col("_side").asc +: tiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = carry.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select((Seq(keyCol, timeCol) ++ leftCols ++ carry.map(c => s"asof_$c"))
        .map(col): _*)
  }

  /** As-of join with a TOLERANCE bound: like [[asOfJoin]], but a match
    * older than `toleranceMicros` is nulled out — "attribute the purchase
    * to the last click, but only within the attribution window". Same
    * plan as the unbounded form (the matched right timestamp rides along
    * as one extra carried column, then one projection applies the gap
    * test); micros-exact comparison so sub-second boundaries agree with
    * the oracle engine. */
  def asOfJoinTolerance(leftDf: DataFrame, rightDf: DataFrame,
                        keyCol: String, timeCol: String,
                        carry: Seq[String], toleranceMicros: Long): DataFrame = {
    require(toleranceMicros > 0, s"tolerance must be positive: $toleranceMicros")
    // carry ONE struct, not independent columns: plain asOfJoin LOCFs each
    // carried column independently (skipping nulls), so a null field on
    // the as-of row could surface an OLDER row's value past the tolerance
    // gate — packing makes every carried field come from the same matched
    // row as the timestamp the gap test inspects
    val packed = rightDf.withColumn("_pack",
      struct(carry.map(col) :+ col(timeCol).as("_rts"): _*))
    val joined = asOfJoin(leftDf, packed, keyCol, timeCol, Seq("_pack"))
    val within = col("asof__pack").isNotNull &&
      (unix_micros(col(timeCol)) -
        unix_micros(col("asof__pack").getField("_rts")) <= toleranceMicros)
    carry.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(within, col("asof__pack").getField(c)))
    }.drop("asof__pack")
  }
}
