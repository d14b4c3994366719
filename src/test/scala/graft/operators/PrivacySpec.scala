package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, String)*) =
    rows.toDF("user_id", "event_type")

  private val testDomain = Seq("view", "buy")

  test("privateGroupCounts: distinct-user base, bounded deterministic noise") {
    // user 1 appears 3× in 'view' but contributes 1 to its count
    val events = ev((1L, "view"), (1L, "view"), (1L, "view"), (2L, "view"),
      (1L, "buy"), (3L, "buy"))
    val got = Privacy.privateGroupCounts(events, testDomain, eps = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // exact distinct counts are 2 ('view') and 2 ('buy'); Laplace(1) noise
    // from the 1e-4-grid uniform is bounded by ln(10000) ≈ 9.21
    assert(math.abs(got("view") - 2.0) <= 9.22)
    assert(math.abs(got("buy") - 2.0) <= 9.22)
    // reproducible: same seed -> identical release
    val again = Privacy.privateGroupCounts(events, testDomain, eps = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == again)
    // a rotated seed re-draws the noise (different release epoch)
    val rotated = Privacy.privateGroupCounts(events, testDomain, eps = 1.0,
      seed = "dp-release-1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rotated != got)
  }

  test("privateGroupCounts: the released key set is the PUBLIC domain") {
    // 'gift' is observed but NOT public -> discarded; 'buy' is public but
    // unobserved -> released as noise around 0. The key set cannot depend
    // on the data (a one-user group appearing/vanishing would leak).
    val events = ev((1L, "view"), (2L, "gift"))
    val got = Privacy.privateGroupCounts(events, testDomain, eps = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == testDomain.toSet)
    assert(math.abs(got("buy") - 0.0) <= 9.22) // noisy zero, still released
    // identical key set on data missing 'buy' entirely vs data having it
    val withBuy = Privacy.privateGroupCounts(
      ev((1L, "view"), (2L, "buy")), testDomain, eps = 1.0)
      .collect().map(_.getString(0)).toSet
    assert(withBuy == got.keySet)
  }

  test("privateGroupCounts: tighter epsilon means proportionally smaller noise") {
    val events = ev((1L, "view"), (2L, "view"))
    def noise(eps: Double): Double =
      Privacy.privateGroupCounts(events, Seq("view"), eps = eps)
        .collect()(0).getDouble(1) - 2.0
    // same uniform draw, scale 1/eps: noise(0.5) = 2 × noise(1) (± the 4dp
    // rounding of each release)
    assert(math.abs(noise(0.5) - 2 * noise(1.0)) < 2e-4,
      s"${noise(0.5)} vs ${noise(1.0)}")
  }

  test("privateMedian: lands near the true median at sane epsilon, replays") {
    import org.apache.spark.sql.functions.col
    val orders = graft.Tables.orders(spark, sf0001)
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    // public domain bound for o_totalprice: [$0, $600,000] — schema
    // knowledge, not computed from the data
    val (lo, hi) = (0L, 60000000L)
    val r = Privacy.privateMedian(orders, cents, lo, hi, eps = 1.0).collect()
    assert(r.length == 1)
    val row = r.head
    // the released row must NOT carry the exact count — epsilon, cell, value only
    assert(r.head.schema.fieldNames.toSeq ==
      Seq("epsilon", "grid_cell", "private_median"))
    val released = row.getDouble(2)
    val truth = orders.stat.approxQuantile("o_totalprice", Array(0.5), 0.0).head
    // exponential mechanism at eps=1, n~1.5k: utility gap to a far cell is
    // hundreds of nats - the release must land within a few grid cells of
    // the true median (grid cell width = span/101 ≈ $5,941)
    assert(math.abs(released - truth) < (hi - lo) / 100.0 / 101.0 * 3,
      s"released $released vs median $truth")
    // deterministic replay: same seed, any layout
    val r2 = Privacy.privateMedian(orders.repartition(7), cents, lo, hi,
      eps = 1.0).collect()
    assert(r.toSeq == r2.toSeq)
    // a rotated seed may move the release; the mechanism stays in the
    // public domain
    val r3 = Privacy.privateMedian(orders, cents, lo, hi, eps = 1.0,
      seed = "dp2-release-1").head
    assert(r3.getDouble(2) >= lo / 100.0 - 1 && r3.getDouble(2) <= hi / 100.0 + 1)
    // the grid is data-independent: shifting every value by a constant
    // must keep every candidate edge identical (only the histogram moves)
    val shifted = Privacy.privateMedian(orders, cents + lit(500000L), lo, hi,
      eps = 1.0).head
    val cellEdge = (k: Long) => (lo + math.floor((k + 1).toDouble *
      (hi - lo + 1).toDouble / 101).toLong - 1).toDouble / 100.0
    assert(shifted.getDouble(2) == cellEdge(shifted.getLong(1)))
    assert(row.getDouble(2) == cellEdge(row.getLong(1)))
  }

  test("kAnonymityAudit flags small groups and sensitive-constant groups") {
    val df = Seq(
      // group (1, A): 3 rows, sensitive constant -> below_k (k=5), below_l
      (1L, "A", 10L), (1L, "A", 10L), (1L, "A", 10L),
      // group (2, B): 5 rows, 3 distinct sensitive -> passes both
      (2L, "B", 1L), (2L, "B", 2L), (2L, "B", 3L), (2L, "B", 1L), (2L, "B", 2L),
      // group (3, C): 6 rows but only 2 sensitive values -> below_l only
      (3L, "C", 7L), (3L, "C", 8L), (3L, "C", 7L),
      (3L, "C", 8L), (3L, "C", 7L), (3L, "C", 8L))
      .toDF("region", "segment", "sens")
    val got = Privacy.kAnonymityAudit(df, Seq("region", "segment"), col("sens"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    assert(got.size == 3)
    val a = got((1L, "A"))
    assert(a.getAs[Long]("group_size") == 3 && a.getAs[Boolean]("below_k")
      && a.getAs[Long]("l_diversity") == 1 && a.getAs[Boolean]("below_l"))
    val b = got((2L, "B"))
    assert(!b.getAs[Boolean]("below_k") && !b.getAs[Boolean]("below_l"))
    val c = got((3L, "C"))
    assert(!c.getAs[Boolean]("below_k") && c.getAs[Boolean]("below_l"))
  }
}
