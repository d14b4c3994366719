package graft.operators

import graft.SparkTestBase

class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private def aggOf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("k", "n_orders", "sum_cents")

  test("mergeAggDeltas: merge equals recompute; delta-only keys appear") {
    val base = aggOf(Seq((1L, 2L, 100L), (2L, 1L, 50L)))
    val delta = aggOf(Seq((1L, 1L, 30L), (3L, 4L, 400L)))
    val got = Incremental.mergeAggDeltas(base, delta, Seq("k"),
      "n_orders", Seq("sum_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 130L), (2L, 1L, 50L), (3L, 4L, 400L)))
  }

  test("mergeAggDeltas: retraction to zero count removes the key") {
    val base = aggOf(Seq((1L, 2L, 100L), (2L, 1L, 50L)))
    // key 1 fully retracted (negative delta), key 2 partially
    val delta = aggOf(Seq((1L, -2L, -100L), (2L, -1L, -20L)))
    val got = Incremental.mergeAggDeltas(base, delta, Seq("k"),
      "n_orders", Seq("sum_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // key 2's count also hit 0 -> both gone; nothing negative survives
    assert(got == Set.empty[(Long, Long, Long)])
    val partial = Incremental.mergeAggDeltas(base,
      aggOf(Seq((1L, -1L, -60L))), Seq("k"), "n_orders", Seq("sum_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(partial == Set((1L, 1L, 40L), (2L, 1L, 50L)))
  }

  test("deltaJoin: view + delta equals full recompute (the IVM identity)") {
    import org.apache.spark.sql.functions.col
    val o = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey").as("custkey"), col("o_orderdate"))
    val c = graft.Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("custkey"), col("c_name"))
    val split = org.apache.spark.sql.functions.lit("2001-05-01 00:00:00").cast("timestamp")
    val (a, da) = (o.filter(col("o_orderdate") < split).drop("o_orderdate"),
      o.filter(col("o_orderdate") >= split).drop("o_orderdate"))
    val (b, db) = (c.filter(col("custkey") % 13 =!= 5),
      c.filter(col("custkey") % 13 === 5))
    val delta = Incremental.deltaJoin(a, da, b, db, Seq("custkey"))
    val proj = Seq("custkey", "o_orderkey", "c_name").map(col)
    // stored view (A join B) plus the delta = join of the full tables
    val maintained = a.join(b, "custkey").select(proj: _*)
      .unionByName(delta.select(proj: _*))
    val recomputed = o.drop("o_orderdate").join(c, "custkey").select(proj: _*)
    assert(maintained.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(maintained).isEmpty)
    // every term tag appears...
    val tags = delta.select("delta_term").distinct()
      .collect().map(_.getString(0)).toSet
    assert(tags == Set("da_b", "a_db", "da_db"))
    // ...and the delta only produces NEW rows: nothing it emits was
    // already in the stored view (the base-join-base work is untouched)
    assert(delta.select(proj: _*)
      .intersect(a.join(b, "custkey").select(proj: _*)).isEmpty)
  }
}
