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
}
