package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions.{col, count, lit}

/** Plan-shape assertions: the promises that matter at 100 TB — pushdown,
  * pruning, broadcast joins, no cartesian products — verified against the
  * actual physical plans, not hoped for. */
class PlanSpec extends SparkTestBase {

  private def planOf(name: String): String = {
    val df = Queries.all(name)(spark, sf0001)
    df.collect() // finalize AQE so the inspected plan is the executed one
    df.queryExecution.executedPlan.toString
  }

  test("s1: filter and projection are pushed to the parquet scan") {
    val p = planOf("s1_scan_prune")
    assert(p.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,100.0)]"), p)
    assert(p.contains("ReadSchema") &&
      !p.contains("c_mktsegment"), "projection should prune unused columns\n" + p)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // a selective dim-side filter should inject a bloom filter on the fact
    // scan when the join shuffles — the runtime-filter story for fact-fact
    // joins whose selective side is too big to broadcast at 100 TB
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf0001)
      val o = Tables.orders(spark, sf0001).filter(col("o_totalprice") > 400000)
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("e1: dimension joins are broadcast, not shuffled") {
    val p = planOf("e1_users_pipeline")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q1: aggregation is partial (map-side combine) before the exchange") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial"), "expected partial_* map-side aggregation\n" + p)
  }

  test("d4: inverted-index join plans without a cartesian product") {
    val p = planOf("d4_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("scalar suite stays inside whole-stage codegen") {
    val p = planOf("c1_scalar_suite")
    // codegen'd operators print as "*(n) Op" in the compact plan string
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined, p)
  }

  test("every registered query has either an oracle or a documented skip") {
    // the raw pair/neighbor lists of approximate operators are rows-only
    // by design; each is twinned with a full-oracle gate (d2_minhash_gate,
    // d6_lsh_gate, d6_production_gate, sim2_ann_gate, sim2_production_gate,
    // sim3_ivf_gate, sim4_knn_gate, hn2_gate, pq2_adc_gate, pq3_batch_gate,
    // bitext2_gate)
    val rowsOnly = Set("a4_distinct_hll", "d2_dedup_minhash", "sim2_ann_lsh", "sim3_ann_ivf", "d6_neardup_lsh", "src1_users_api", "sim4_knn_graph",
      "d6_production", "sim2_production", "hn2_production", "pq2_adc_search",
      "pq2_production", "pq3_batch_join", "bitext2_production")
    val missing = Queries.all.keySet -- Queries.oracles.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle or skip-list entry: $missing")
  }

  test("oracle keys all reference registered queries") {
    val orphans = Queries.oracles.keySet -- Queries.all.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
