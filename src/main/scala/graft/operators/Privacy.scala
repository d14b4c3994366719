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

  /** ε-DP noisy distinct-user counts per `groupCol`, released over a
    * PUBLIC, data-independent group domain. Emits the noisy count only —
    * the exact count must not appear next to its noisy release — and
    * emits exactly one row per `publicDomain` value: a group key that
    * appears or vanishes with a single user would itself leak (the
    * partition-selection problem), so groups absent from the data release
    * noise around 0, and observed values OUTSIDE the public domain are
    * discarded (the standard rule: contributions outside the public
    * partition set don't enter the release; for unknown domains the
    * (ε,δ) thresholding mechanism applies instead — deliberately not
    * implemented here, pass the domain).
    *
    * Budget composition: `epsilon` on each row is the PER-GROUP budget.
    * A single user_id may contribute to several groups (e.g. both 'view'
    * and 'click'), so by basic composition the release as a whole is
    * (g·ε)-DP where g is the max number of domain groups one user touches
    * (≤ |publicDomain|). Callers accounting a total budget must divide by
    * their g bound (or clip contributions to one group upstream); the
    * per-row label deliberately reports the mechanism parameter, not the
    * composed total, matching how per-query budgets are tracked. */
  def privateGroupCounts(events: DataFrame, publicDomain: Seq[String],
                         groupCol: String = "event_type",
                         eps: Double = 1.0, seed: String = "dp-release-0"): DataFrame = {
    require(publicDomain.nonEmpty, "publicDomain must not be empty")
    val spark = events.sparkSession
    import spark.implicits._
    val domain = publicDomain.toDF(groupCol)
    val g = events.filter(col(groupCol).isin(publicDomain: _*))
      .groupBy(col(groupCol))
      .agg(count_distinct(col("user_id")).as("_n"))
    val full = domain.join(g, Seq(groupCol), "left")
      .select(col(groupCol), coalesce(col("_n"), lit(0L)).as("n"))
    // u ∈ (0,1) on a 1e-4 grid, centered; the +0.5 half-step keeps v
    // strictly inside (−½, ½) so ln(1−2|v|) is finite
    val u = (Sampling.hashBucket(concat(lit(seed), lit(":"), col(groupCol)))
      .cast("double") + 0.5) / 10000.0
    val v = u - 0.5
    val noise = lit(-1.0 / eps) * signum(v) * log(lit(1.0) - abs(v) * 2.0)
    full.select(col(groupCol),
      portableRound(col("n").cast("double") + noise, 4).as("noisy_users"),
      lit(eps).as("epsilon"))
  }

  /** ε-DP median via the EXPONENTIAL mechanism (McSherry–Talwar, public) —
    * the second textbook DP primitive next to [[privateGroupCounts]]'
    * Laplace: candidates are a fixed `gridSize`-point grid over the
    * PUBLIC, data-independent range `[loCents, hiCents]` (the mechanism's
    * ε-DP proof requires the candidate set not depend on the data — a
    * min/max-derived grid would leak the exact extremes through the
    * released cell edges), utility u(c) = −|#{v ≤ c} − n/2| (rank
    * distance to the median, sensitivity 1 under add/remove-one), and the
    * release samples ∝ exp(ε·u/2) — here realized EXACTLY by the
    * Gumbel-max trick: add a Gumbel(0,1) draw to ε·u/2 and take the
    * argmax. The Gumbel comes from the same keyed-PRF uniform as the
    * Laplace noise (portable md5 grid, per-candidate salt), snapped to
    * 1e-6 so the double-`ln` composition can never disagree between
    * engines; the whole release replays in the oracle.
    *
    * The exact row count n participates ONLY in the utility (where the
    * mechanism's privacy analysis covers it); it is NOT part of the
    * released row — privateGroupCounts' rule that an exact count must
    * never appear next to its noisy release applies here too. Values
    * outside the public bounds are clamped in (standard DP practice: the
    * clamp is part of the query, its effect bounded by the sensitivity
    * argument).
    *
    * Scale shape: one count aggregate, one `gridSize`-bucket histogram
    * (map-side combinable — the ONLY corpus-sized pass), a grid-sized
    * cumulative window (constant-bounded by construction, the ml3
    * argument), and a TakeOrdered-1 pick. Nothing corpus-sized ever
    * shuffles or sorts. */
  def privateMedian(df: DataFrame, valueCents: org.apache.spark.sql.Column,
                    loCents: Long, hiCents: Long,
                    eps: Double = 1.0, gridSize: Int = 101,
                    seed: String = "dp2-release-0"): DataFrame = {
    require(gridSize >= 3, s"gridSize must be >= 3, got $gridSize")
    require(hiCents > loCents,
      s"public bounds must satisfy hi > lo, got [$loCents, $hiCents]")
    val span = (hiCents - loCents + 1L).toDouble
    // clamp into the public domain, then bucket against the PUBLIC grid —
    // every constant below is caller-supplied, nothing derives from data
    val v = df.select(
      greatest(least(valueCents.cast("long"), lit(hiCents)), lit(loCents)).as("_v"))
    val bucket = least(
      floor((col("_v") - loCents).cast("double") * gridSize / span).cast("long"),
      lit(gridSize - 1L))
    val hist = v.groupBy(bucket.as("k")).agg(count(lit(1)).as("_c"))
    // n: internal utility input only — never selected into the release
    val nDf = df.agg(count(lit(1)).as("_n"))
    val grid = nDf.select(col("_n"),
      explode(sequence(lit(0L), lit(gridSize - 1L))).as("k"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val u = (Sampling.hashBucket(
      concat(lit(seed), lit(":"), col("k").cast("string")), 1000000)
      .cast("double") + 0.5) / 1000000.0
    val gumbel = portableRound(-log(-log(u)), 6)
    val scored = grid.join(hist, Seq("k"), "left")
      .withColumn("_cum", sum(coalesce(col("_c"), lit(0L))).over(w))
      .withColumn("_util",
        -abs(col("_cum").cast("double") - col("_n").cast("double") / 2.0))
      .withColumn("_score", lit(eps / 2.0) * col("_util") + gumbel)
    scored.orderBy(col("_score").desc, col("k").asc).limit(1)
      .select(lit(eps).as("epsilon"), col("k").as("grid_cell"),
        // the cell's upper edge, in dollars — the released value; a pure
        // function of (k, public bounds), data-free by construction
        ((lit(loCents) + floor((col("k") + 1).cast("double") * span / gridSize)
          .cast("long") - 1L).cast("double") / 100.0).as("private_median"))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2007) — the release gate a dataset passes BEFORE rows leave the
    * trust boundary: group by the quasi-identifier combination and
    * report, per group, its size (k-anonymity: every row must hide in a
    * group of ≥ k look-alikes) and the number of distinct sensitive
    * values (l-diversity: a group whose sensitive column is constant
    * re-identifies by membership alone, however large it is). Rows in
    * `below_k` or `below_l` groups are what a release either suppresses
    * or generalizes further (coarser QI buckets) — this audit is the
    * loop condition of that generalization ladder.
    *
    * Scale shape: ONE hash aggregation on the QI columns (the distinct
    * sensitive count is Spark's standard two-level partial-distinct
    * aggregate — map-side combined, no row explosion). Group cardinality
    * is the QI domain, dimension-bounded at any corpus size. */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitive: org.apache.spark.sql.Column,
                      k: Int = 5, l: Int = 3): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2 && l >= 2, s"degenerate thresholds: k=$k l=$l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(sensitive).as("l_diversity"))
      .select(qiCols.map(col) ++ Seq(col("group_size"), col("l_diversity"),
        (col("group_size") < k).as("below_k"),
        (col("l_diversity") < l).as("below_l")): _*)
  }
}
