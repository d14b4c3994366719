package graft.operators

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits (a even positions, b odd)") {
    val got = Seq((3L, 1L), (1L, 3L), (0L, 0L), (255L, 0L))
      .toDF("a", "b")
      .select(Layout.zValue($"a", $"b", 8))
      .collect().map(_.getLong(0)).toSeq
    // (3,1): a bits 0,1 → 1+4 = 5; b bit 0 → 2 ⇒ 7
    // (1,3): a bit 0 → 1; b bits 0,1 → 2+8 ⇒ 11
    // (255,0): a bits 0..7 at even positions ⇒ 0b0101010101010101
    assert(got == Seq(7L, 11L, 0L, 0x5555L))
  }

  test("zorderBy clusters BOTH dimensions; single-column sort clusters only one") {
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong, x * 64L + y)).toDF("x", "y", "id")
      .repartition(7) // arbitrary incoming layout

    val zed = Layout.zorderBy(grid, "x", "y").cache()
    try {
      // content untouched
      assert(zed.count() == 64 * 64)
      assert(zed.select("id").except(grid.select("id")).isEmpty)
      // with 4 range partitions over the z-value the partitions are the
      // four quadrants: both per-partition extents ≈ half the global.
      // Bound at 0.75, not 0.5: repartitionByRange SAMPLES its boundaries,
      // so quadrant edges wobble a few percent run to run (observed 0.70±)
      assert(Layout.meanExtent(zed, "x") <= 0.75,
        s"x extent ${Layout.meanExtent(zed, "x")}")
      assert(Layout.meanExtent(zed, "y") <= 0.75,
        s"y extent ${Layout.meanExtent(zed, "y")}")
      // control: range-partition by x alone → x clusters, y spans ~the full range
      val byX = grid.repartitionByRange(org.apache.spark.sql.functions.col("x"))
      assert(Layout.meanExtent(byX, "y") >= 0.85,
        s"control y extent ${Layout.meanExtent(byX, "y")}")
    } finally zed.unpersist()
  }

  test("zorderBy guards reserved columns and survives empty/constant input") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(Layout.zorderBy(empty, "x", "y").count() == 0)
    val const = Seq((1L, 1L), (1L, 1L)).toDF("x", "y")
    assert(Layout.zorderBy(const, "x", "y").count() == 2) // span 0 → bin 0
    val clash = Seq((1L, 2L)).toDF("x", "_z")
    intercept[IllegalArgumentException](Layout.zorderBy(clash, "x", "_z"))
  }

  test("zorderBy passes through when EITHER clustering column is all null") {
    val nullY = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("x", "y")
    assert(Layout.zorderBy(nullY, "x", "y").count() == 2)
    assert(Layout.zorderBy(nullY, "y", "x").count() == 2)
  }

  test("meanExtent reports 1 (unclustered) for a constant column, rejects empty") {
    val const = Seq((1L, 5L), (2L, 5L)).toDF("x", "y").repartition(2)
    assert(Layout.meanExtent(const, "y") == 1.0)
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    intercept[IllegalArgumentException](Layout.meanExtent(empty, "y"))
  }

  test("compactionPlan packs in order, near target, never across partitions") {
    val manifest = Seq(
      // partition "a": 6 small files of 40 -> two bins of ~100 at target 100
      ("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L),
      ("a", 4L, 40L), ("a", 5L, 40L), ("a", 6L, 40L),
      // partition "b": one oversized file -> its own bin, stays bin 0
      ("b", 1L, 500L), ("b", 2L, 40L))
      .toDF("part", "file_id", "bytes")
    val plan = Layout.compactionPlan(manifest, 100L).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // in-order running-sum packing: 40+40+40 crosses 100 at file 3's START
    // of 80 -> files 1-3 land in bin 0 (bin = floor(bytes_before/100))
    assert(plan(("a", 1L)) == 0 && plan(("a", 2L)) == 0 && plan(("a", 3L)) == 0)
    assert(plan(("a", 4L)) == 1 && plan(("a", 5L)) == 1 && plan(("a", 6L)) == 2)
    // the oversized file occupies bin 0; its successor starts bin 5
    assert(plan(("b", 1L)) == 0 && plan(("b", 2L)) == 5)
    // bins restart per partition (no cross-partition merge): both "a" and
    // "b" have a bin 0 even though "a" already filled several bins
    intercept[IllegalArgumentException](Layout.compactionPlan(manifest, 0L))
  }

  test("joinKeySkewAudit: profile and salt factor on a known skewed key") {
    // key 1 holds 6 of 10 rows; keys 2..5 hold one each
    val rows = (Seq.fill(6)(1L) ++ Seq(2L, 3L, 4L, 5L)).toDF("k")
    val r = Layout.joinKeySkewAudit(rows, "k", topK = 3,
      targetRowsPerKey = 2L).collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == 2.0)          // mean rows/key
    assert(r.getDouble(4) == 3.0)          // skew = max/mean
    assert(r.getDouble(5) == 0.8)          // top-3 = 6+1+1 of 10
    assert(r.getLong(6) == 3L)             // ceil(6/2)
    // uniform key: skew 1, salt 1
    val flat = Seq(1L, 2L, 3L, 4L).toDF("k")
    val f = Layout.joinKeySkewAudit(flat, "k", topK = 3,
      targetRowsPerKey = 2L).collect()(0)
    assert(f.getDouble(4) == 1.0 && f.getLong(6) == 1L)
  }

  test("zoneMapStats: clustering turns a range scan into file skipping") {
    import org.apache.spark.sql.functions.col
    val o = graft.Tables.orders(spark, sf0001)
    val n = o.count()
    def stats(orderBy: org.apache.spark.sql.Column, name: String) =
      Layout.zoneMapStats(o, orderBy, col("o_orderkey"), col("o_totalprice"),
        128, name, 200000.0, 250000.0).collect()
    val clustered = stats(col("o_totalprice"), "clustered")
    val natural = stats(col("o_orderkey"), "natural")
    // both layouts cover every row exactly once
    assert(clustered.map(_.getLong(2)).sum == n)
    assert(natural.map(_.getLong(2)).sum == n)
    // zone maps are consistent: min <= max, and files are range-disjoint
    // under the clustered layout (file i's max <= file i+1's min)
    val byId = clustered.sortBy(_.getLong(1))
    byId.foreach(r => assert(r.getDouble(3) <= r.getDouble(4)))
    byId.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(4) <= b.getDouble(3) + 1e-9)
      case _ =>
    }
    // the point of the operator: clustering skips most files for a
    // selective predicate; natural order scans nearly all of them
    val scannedC = clustered.count(_.getBoolean(5)).toDouble / clustered.length
    val scannedN = natural.count(_.getBoolean(5)).toDouble / natural.length
    assert(scannedC < 0.35, s"clustered scanned fraction $scannedC")
    assert(scannedN > 0.8, s"natural scanned fraction $scannedN")
  }

  test("bloomSkipStats: zero false negatives, fill-bounded bitmaps, " +
    "and real skipping on an unclustered key") {
    import org.apache.spark.sql.functions._
    val orders = graft.Tables.orders(spark, sf0001)
    val probes = Seq(7L, 421L, 1399L, 999999L, 123456789L)
    val got = graft.operators.Layout.bloomSkipStats(orders,
      col("o_custkey"), col("o_orderkey"), rowsPerFile = 128,
      bits = 4096, hashes = 3, probes = probes).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getLong(1)).sum == orders.count())
    got.foreach { r =>
      val (nKeys, bitsSet) = (r.getLong(2), r.getLong(3))
      val (nPass, nTrue) = (r.getLong(4), r.getLong(5))
      val (sb, st) = (r.getBoolean(6), r.getBoolean(7))
      // the Bloom contract: a file that truly contains a probe ALWAYS
      // passes — false negatives are impossible by construction
      assert(nPass >= nTrue && (!st || sb), s"file ${r.getLong(0)}")
      assert(bitsSet >= 1 && bitsSet <= math.min(4096L, 3 * nKeys))
    }
    // a probe key known to be in the table must be found somewhere
    val present = orders.select("o_custkey").where(col("o_custkey") === 7).count()
    if (present > 0) assert(got.exists(r => r.getLong(5) > 0))
    // the operator's point: some files are skipped for this probe set
    assert(got.exists(r => !r.getBoolean(6)),
      "no file skipped — filter saturated, raise bits in the query")
  }
}
