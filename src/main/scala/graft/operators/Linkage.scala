package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution by blocked fuzzy matching.
  *
  * The all-pairs edit-distance join is O(N²·|s|²) — dead at any scale. The
  * standard ER decomposition makes it tractable: (1) a BLOCKING key (here a
  * caller-chosen exact-match column — brand, zip, soundex, …) turns the
  * cross product into a per-block one, so the shuffle is an ordinary
  * equi-join on the block key; (2) the quadratic kernel runs on DISTINCT
  * (block, name) values only — real catalogs are full of exact duplicates,
  * and comparing each distinct string pair once instead of once per
  * duplicate pair removes a multiplicity² blowup (6.9M → 50k Levenshtein
  * calls on the sf0.1 fixture) before any expensive work; (3) a cheap
  * length prefilter (|len(a) − len(b)| lower-bounds edit distance)
  * discards most distinct pairs before the DP, which is codegen'd
  * (`levenshtein` is a native Catalyst expression in both engines, classic
  * integer DP — no float drift). Matching distinct pairs then expand back
  * to key pairs by two equi-joins against the (block, name → key) map —
  * the expansion is output-sized, not candidate-sized.
  *
  * At 100 TB the operator cost is the block-key equi-join shuffle on the
  * DISTINCT name set plus Σ_b |distinct(b)|² kernel work — the caller's
  * blocking key choice bounds |b| exactly like d2/d6's LSH bands bound
  * candidate buckets; a skewed block is visible in
  * [[Layout.joinKeySkewAudit]] and fixable by compounding the key
  * (brand × length bucket) before calling this.
  */
object Linkage {

  /** All same-block pairs whose `nameCol` edit distance is ≤ `maxDist`,
    * with the distance — the candidate-match table every dedupe/merge
    * review queue starts from. Pairs are emitted once (`key_a < key_b`,
    * each name column following its key). Output is deterministic:
    * integer keys, integer distances. */
  def blockedFuzzyMatch(df: DataFrame, blockCol: String, keyCol: String,
                        nameCol: String, maxDist: Int): DataFrame = {
    val rows = df.select(col(blockCol).as("block"), col(keyCol).as("key"),
      col(nameCol).as("name"))
    val names = rows.select(col("block"), col("name")).distinct()
    // fuzzy kernel on distinct names only, each unordered pair once
    val fuzzy = names.select(col("block"), col("name").as("na"))
      .join(names.select(col("block"), col("name").as("nb")), Seq("block"))
      .filter(col("na") < col("nb"))
      // length gap lower-bounds edit distance: prunes before the O(|s|²) DP
      .filter(abs(length(col("na")) - length(col("nb"))) <= maxDist)
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("dist") <= maxDist)
    val ka = rows.select(col("block"), col("name").as("na"), col("key").as("k1"))
    val kb = rows.select(col("block"), col("name").as("nb"), col("key").as("k2"))
    // cross-name matches expand to key pairs; key order decides which name
    // is name_a (levenshtein is symmetric, so dist carries over unchanged)
    val cross = fuzzy
      .join(ka, Seq("block", "na")).join(kb, Seq("block", "nb"))
      .select(col("block"),
        least(col("k1"), col("k2")).as("key_a"),
        greatest(col("k1"), col("k2")).as("key_b"),
        when(col("k1") < col("k2"), col("na")).otherwise(col("nb")).as("name_a"),
        when(col("k1") < col("k2"), col("nb")).otherwise(col("na")).as("name_b"),
        col("dist"))
    // exact-duplicate names: every within-group key pair at distance 0
    val same = rows.select(col("block"), col("name"), col("key").as("k1"))
      .join(rows.select(col("block"), col("name"), col("key").as("k2")),
        Seq("block", "name"))
      .filter(col("k1") < col("k2"))
      .select(col("block"), col("k1").as("key_a"), col("k2").as("key_b"),
        col("name").as("name_a"), col("name").as("name_b"),
        lit(0L).as("dist"))
    cross.unionByName(same)
  }

  /** [[blockedFuzzyMatch]] with BOUNDED output on exact-duplicate hot
    * groups — the production ER shape. The full-clique form is quadratic
    * in group MULTIPLICITY by contract: m records sharing one name emit
    * C(m,2) distance-0 pairs, and a matched name pair with multiplicities
    * (m_a, m_b) emits m_a·m_b rows — the sfx10 sweep's 15× er1 blow-up
    * was exactly this ("many entities named John Smith" is a real corpus
    * shape, not just a synthesis artifact). No blocking key can shrink a
    * quadratic OUTPUT, so this form changes what is emitted, preserving
    * the pair graph's connected components exactly:
    *
    *   - each exact (block, name) group collapses to its min-key
    *     REPRESENTATIVE, and the group emits a distance-0 STAR
    *     (representative ↔ each other member): m−1 rows, not C(m,2);
    *   - each fuzzy-matched distinct name pair emits ONE pair between
    *     the two groups' representatives: 1 row, not m_a·m_b.
    *
    * Total output is O(N + distinct matches) — linear in block
    * population — while any downstream merge/cluster step (connected
    * components, d7 discipline) sees the identical partition: a star
    * spans its group, and the representative edge links the two stars.
    * The distinct-name Levenshtein kernel is unchanged (its cost is the
    * caller's blocking-key contract, same as the clique form). */
  def blockedFuzzyMatchStar(df: DataFrame, blockCol: String, keyCol: String,
                            nameCol: String, maxDist: Int): DataFrame = {
    val rows = df.select(col(blockCol).as("block"), col(keyCol).as("key"),
      col(nameCol).as("name"))
    val groups = rows.groupBy(col("block"), col("name"))
      .agg(min(col("key")).as("rep"))
    val fuzzy = groups.select(col("block"), col("name").as("na"))
      .join(groups.select(col("block"), col("name").as("nb")), Seq("block"))
      .filter(col("na") < col("nb"))
      .filter(abs(length(col("na")) - length(col("nb"))) <= maxDist)
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("dist") <= maxDist)
    val repPairs = fuzzy
      .join(groups.select(col("block"), col("name").as("na"), col("rep").as("r1")),
        Seq("block", "na"))
      .join(groups.select(col("block"), col("name").as("nb"), col("rep").as("r2")),
        Seq("block", "nb"))
      .select(col("block"),
        least(col("r1"), col("r2")).as("key_a"),
        greatest(col("r1"), col("r2")).as("key_b"),
        when(col("r1") < col("r2"), col("na")).otherwise(col("nb")).as("name_a"),
        when(col("r1") < col("r2"), col("nb")).otherwise(col("na")).as("name_b"),
        col("dist"))
    // rep = min key of the group, so key_a < key_b holds by construction
    val star = rows.join(groups, Seq("block", "name"))
      .filter(col("key") =!= col("rep"))
      .select(col("block"), col("rep").as("key_a"), col("key").as("key_b"),
        col("name").as("name_a"), col("name").as("name_b"), lit(0L).as("dist"))
    repPairs.unionByName(star)
  }
}
