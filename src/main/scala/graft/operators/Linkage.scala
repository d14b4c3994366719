package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution by blocked fuzzy matching.
  *
  * The all-pairs edit-distance join is O(N²·|s|²) — dead at any scale. The
  * standard ER decomposition makes it tractable: (1) a BLOCKING key (here a
  * caller-chosen exact-match column — brand, zip, soundex, …) turns the
  * cross product into a per-block one, so the shuffle is an ordinary
  * equi-join on the block key; (2) a cheap length prefilter discards most
  * candidate pairs before the quadratic kernel runs (|len(a) − len(b)| is a
  * lower bound on edit distance); (3) only survivors pay the Levenshtein
  * DP, which is codegen'd (`levenshtein` is a native Catalyst expression in
  * both engines, classic integer DP — no float drift).
  *
  * At 100 TB the operator cost is the block-key equi-join shuffle plus
  * Σ_b |b|² kernel work — the caller's blocking key choice bounds |b|
  * exactly like d2/d6's LSH bands bound candidate buckets; a skewed block
  * is visible in [[Layout.joinKeySkewAudit]] and fixable by compounding
  * the key (brand × length bucket) before calling this.
  */
object Linkage {

  /** All same-block pairs whose `nameCol` edit distance is ≤ `maxDist`,
    * with the distance — the candidate-match table every dedupe/merge
    * review queue starts from. Pairs are emitted once (`key_a < key_b`).
    * Output is deterministic: integer keys, integer distances. */
  def blockedFuzzyMatch(df: DataFrame, blockCol: String, keyCol: String,
                        nameCol: String, maxDist: Int): DataFrame = {
    val a = df.select(col(blockCol).as("block"), col(keyCol).as("key_a"),
      col(nameCol).as("name_a"))
    val b = df.select(col(blockCol).as("block"), col(keyCol).as("key_b"),
      col(nameCol).as("name_b"))
    a.join(b, Seq("block"))
      .filter(col("key_a") < col("key_b"))
      // length gap lower-bounds edit distance: prunes before the O(|s|²) DP
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("block"), col("key_a"), col("key_b"),
        col("name_a"), col("name_b"), col("dist"))
  }
}
