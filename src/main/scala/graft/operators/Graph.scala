package graft.operators

import graft.functions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Iterative graph analytics as Spark plans. Companion to the
  * connected-components operator in [[Dedup.duplicateClusters]]: same
  * driver-side iteration loop, same per-round `localCheckpoint` discipline
  * (cut lineage so round N does not replay rounds 1..N-1 or the edge
  * build), same determinism rule — every per-iteration float passes
  * through a fixed-scale portable round, so the converged values are
  * bit-identical across engines, partitionings and AQE re-plans. */
object Graph {

  /** PageRank with a fixed iteration count and the "leaky" dangling-mass
    * formulation (nodes without out-edges contribute nothing — mass sums
    * slightly below 1 when they exist; well-defined and cheap to mirror
    * in an oracle).
    *
    * Per iteration: contribution of edge (u→v) is round(r_u · d/deg_u),
    * summed EXACTLY as decimals per target node, plus the (1−d)/N
    * teleport. A zero-weight self-loop per node keeps rankless nodes in
    * the frontier (so isolated nodes hold the teleport rank) — that
    * trick also lets the DuckDB recursive-CTE oracle reference the
    * working table exactly once.
    *
    * Scale shape: ranks ⋈ contribs is a shuffle-or-broadcast hash join
    * keyed on the node id, followed by one map-side-combinable decimal
    * sum per iteration — the textbook bulk-synchronous PageRank round.
    * Iteration count is a fixed parameter (rounds, not convergence
    * polling), so the driver never inspects data between rounds. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val contribs = edges.join(outdeg, "src")
      .select(col("src"), col("dst"),
        portableRound(lit(damping) / col("deg"), 12).as("w"))
      .unionByName(nodes.select(col("node").as("src"), col("node").as("dst"),
        lit(0.0).as("w")))
      .localCheckpoint() // reused every round: never replay the edge build
    val nn = nodes.agg(count(lit(1)).cast("double").as("n"))
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n")).as("r"))
    // checkpoint the rank frame every few rounds, not every round: the
    // expensive lineage (the edge build) is already cut by contribs'
    // checkpoint, so short runs execute as one job — but Catalyst
    // re-optimizes the whole accumulated plan per round, which grows
    // superlinearly past a handful of nested join+agg rounds (measured:
    // 50 unckeckpointed rounds hang analysis), so bound the segment depth
    for (i <- 1 to iters) {
      ranks = ranks.join(contribs, ranks("node") === contribs("src"))
        .groupBy(col("dst"))
        .agg(sum(portableRound(col("r") * col("w"), 12).cast("decimal(28,12)"))
          .as("contrib"))
        .crossJoin(broadcast(nn))
        .select(col("dst").as("node"),
          // teleport literal rounded to 1e-12 so it is BIT-identical to
          // the oracle's decimal literal: 1.0 - 0.85 in binary floating
          // point is 0.15000000000000002, one ulp above the parsed 0.15
          portableRound(lit(math.floor((1.0 - damping) * 1e12 + 0.5) / 1e12) /
            col("n") + col("contrib").cast("double"), 10).as("r"))
      if (i % 5 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("r").as("rank"))
  }

  /** Exact triangle count over an UNDIRECTED edge list, by the canonical
    * ordered three-way join: orient every edge low→high, then
    * e(a,b) ⋈ e(b,c) ⋈ e(a,c) with a < b < c counts each triangle exactly
    * once. Input edges may be directed/duplicated — they canonicalize
    * and dedup first.
    *
    * Scale: the first join shuffles on the shared endpoint, the closing
    * join on the (a, c) pair — both id-width. The a<b<c orientation IS
    * the dedup (no ÷6 correction, no symmetric blowup); for skewed degree
    * distributions the classic refinement (order by degree instead of id)
    * drops the wedge count from Σd² on hubs to near-optimal — noted here,
    * not needed at dimension-graph sizes. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val e1 = und.select(col("a"), col("b"))
    val e2 = und.select(col("a").as("b"), col("b").as("c"))
    val e3 = und.select(col("a").as("ca"), col("b").as("cb"))
    e1.join(e2, "b")
      .join(e3, col("a") === col("ca") && col("c") === col("cb"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
