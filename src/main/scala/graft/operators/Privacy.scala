package graft.operators

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential-privacy releases over grouped user statistics.
  *
  * A training-data platform publishes corpus stats (per-source counts,
  * per-cohort activity) outside the trust boundary; ε-DP noise makes those
  * releases safe to share. The mechanism here is the textbook Laplace one:
  * per-group USER counts (each user contributes at most once per group, so
  * the L1 sensitivity of one group's count is 1) plus Laplace(1/ε) noise
  * via inverse-CDF sampling, `−(1/ε)·sign(v)·ln(1−2|v|)` for uniform
  * v ∈ (−½, ½).
  *
  * The uniform draw is the engine-portable md5 bucket of (seed ⊕ group
  * key) — deterministic, so the release is reproducible and the DuckDB
  * oracle replays it digit for digit. Determinism-vs-privacy is a real
  * tension: a FIXED seed means re-running leaks nothing new (same noise),
  * but the seed must be secret and rotated per release epoch — that is the
  * caller's `seed` parameter, exactly how production DP systems derive
  * per-release noise from a keyed PRF rather than an OS RNG.
  *
  * Scale shape: one distinct-aggregate (user, group) → one tiny group agg;
  * the noise is a per-GROUP scalar projection. Nothing shuffles wider than
  * the group keys.
  */
object Privacy {

  /** ε-DP noisy distinct-user counts per `groupCol`. Emits the noisy count
    * only — the exact count must not appear next to its noisy release. */
  def privateGroupCounts(events: DataFrame, groupCol: String = "event_type",
                         eps: Double = 1.0, seed: String = "dp-release-0"): DataFrame = {
    val g = events.groupBy(col(groupCol))
      .agg(count_distinct(col("user_id")).as("n"))
    // u ∈ (0,1) on a 1e-4 grid, centered; the +0.5 half-step keeps v
    // strictly inside (−½, ½) so ln(1−2|v|) is finite
    val u = (Sampling.hashBucket(concat(lit(seed), lit(":"), col(groupCol)))
      .cast("double") + 0.5) / 10000.0
    val v = u - 0.5
    val noise = lit(-1.0 / eps) * signum(v) * log(lit(1.0) - abs(v) * 2.0)
    g.select(col(groupCol),
      portableRound(col("n").cast("double") + noise, 4).as("noisy_users"),
      lit(eps).as("epsilon"))
  }
}
