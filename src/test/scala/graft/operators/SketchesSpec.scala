package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def facts = (1L to 2000L).map { i =>
    // 4 coarse groups × 5 fine groups; distinct values overlap across
    // fine groups within a coarse group, so the union must actually merge
    (i % 4, i % 20, s"v${i % 500}")
  }.toDF("coarse_k", "fine_k", "v")

  test("rolled-up sketch estimate equals the direct coarse-grain sketch") {
    // HLL union is exact over sketch state: merging per-fine sketches must
    // yield byte-identical estimates to sketching the coarse group directly
    val rolled = Sketches.hllDistinctRollup(
      facts, col("fine_k"), col("coarse_k"), col("v"))
    val direct = facts.groupBy(col("coarse_k").as("coarse"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12)))
        .as("approx_distinct"))
    assertSameRows(rolled, direct)
  }

  test("estimates land within 5% of exact distinct counts") {
    val est = Sketches.hllDistinctRollup(
      facts, col("fine_k"), col("coarse_k"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = facts.groupBy("coarse_k").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k) - ex).toDouble / ex <= 0.05,
        s"group $k: est ${est(k)} vs exact $ex")
    }
  }

  test("CMS merge is exact: rolled-up estimates equal the direct sketch's") {
    // Count-Min counter tables add cell-wise, so merging per-fine sketches
    // must reproduce the direct coarse sketch's estimate for EVERY item
    val eps = 1e-3; val conf = 0.99; val seed = 7
    val rolled = Sketches.cmsFrequencyRollup(
      facts, col("fine_k"), col("coarse_k"), col("v"), eps, conf, seed)
    val direct = facts.groupBy(col("coarse_k").as("coarse"))
      .agg(count_min_sketch(col("v"), lit(eps), lit(conf), lit(seed)).as("sk"))
    val items = facts.select(col("coarse_k").as("coarse"), col("v")).distinct()
    def estimates(sk: org.apache.spark.sql.DataFrame) =
      items.join(sk, "coarse")
        .select(col("coarse"), col("v"),
          graft.functions.cms_estimate(col("sk"), col("v")).as("est"))
    assertSameRows(estimates(rolled), estimates(direct))
  }

  test("CMS estimates never undercount and respect the epsilon bound") {
    val eps = 1e-3
    val rolled = Sketches.cmsFrequencyRollup(
      facts, col("fine_k"), col("coarse_k"), col("v"), eps, 0.99, 7)
    val exact = facts.groupBy(col("coarse_k").as("coarse"), col("v"))
      .agg(count(lit(1)).as("exact_n"))
    val n = facts.count()
    val rows = exact.join(rolled, "coarse")
      .select(col("coarse"), col("v"), col("exact_n"),
        graft.functions.cms_estimate(col("sk"), col("v")).as("est_n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ex, est) = (r.getLong(2), r.getLong(3))
      assert(est >= ex, s"${r.getString(1)}: undercounted $est < $ex")
      assert(est <= ex + math.ceil(5 * eps * n).toLong,
        s"${r.getString(1)}: est $est exceeds exact $ex + 5εN")
    }
  }

  test("CMS long items hash consistently between native build and estimate") {
    import spark.implicits._
    val longFacts = (1L to 1000L).map(i => (i % 2, i % 50)).toDF("g", "id")
    val sk = Sketches.cmsFrequencyRollup(
      longFacts, col("g"), lit("all"), col("id"), 1e-3, 0.99, 11)
    val est = longFacts.select(col("id")).distinct()
      .crossJoin(sk.select(col("sk")))
      .select(col("id"), graft.functions.cms_estimate(col("sk"), col("id")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every id 0..49 appears exactly 20 times; ε=10⁻³ over N=1000 rounds to
    // at most +1 of slack, and the fixed seed makes this exact in practice
    (0L to 49L).foreach(id => assert(est(id) >= 20 && est(id) <= 21,
      s"id $id: est ${est(id)}"))
  }
}
