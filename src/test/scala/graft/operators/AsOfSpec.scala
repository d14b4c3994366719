package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the most recent right row at or before each left row") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:30"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3"))
      .toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:20"), 101.0),
      (2L, ts("2024-01-01 10:00:15"), 200.0)) // AFTER trade t3
      .toDF("key", "ts", "price")
    val got = AsOf.asOfJoin(trades, quotes, "key", "ts", Seq("price"))
      .collect().map(r => r.getAs[String]("trade") -> Option(r.getAs[Any]("asof_price"))).toMap
    assert(got("t1").contains(100.0)) // latest quote <= 10:00:05
    assert(got("t2").contains(101.0)) // 10:00:20 quote wins over 10:00:00
    assert(got("t3").isEmpty)         // no quote at or before t3 → null (left join)
  }

  test("tolerance as-of keeps in-window matches, nulls stale ones") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:30"), "fresh"),  // quote 25s earlier: in window
      (1L, ts("2024-01-01 10:02:00"), "stale"),  // quote 115s earlier: out
      (2L, ts("2024-01-01 10:00:00"), "none"))   // no quote at all
      .toDF("key", "ts", "trade")
    val quotes = Seq((1L, ts("2024-01-01 10:00:05"), 100.0)).toDF("key", "ts", "price")
    val got = AsOf.asOfJoinTolerance(trades, quotes, "key", "ts",
      Seq("price"), toleranceMicros = 60L * 1000000L)
      .collect().map(r => r.getAs[String]("trade") -> Option(r.getAs[Any]("asof_price"))).toMap
    assert(got("fresh").contains(100.0))
    assert(got("stale").isEmpty)
    assert(got("none").isEmpty)
    // boundary is inclusive: exactly-60s-old match survives
    val edge = Seq((1L, ts("2024-01-01 10:01:05"), "edge")).toDF("key", "ts", "trade")
    val gotEdge = AsOf.asOfJoinTolerance(edge, quotes, "key", "ts",
      Seq("price"), 60L * 1000000L).collect().head
    assert(Option(gotEdge.getAs[Any]("asof_price")).contains(100.0))
  }

  test("same-instant right row matches (inclusive <=)") {
    val l = Seq((1L, ts("2024-01-01 00:00:10"), "x")).toDF("key", "ts", "v")
    val r = Seq((1L, ts("2024-01-01 00:00:10"), 7.0)).toDF("key", "ts", "price")
    val got = AsOf.asOfJoin(l, r, "key", "ts", Seq("price")).collect()(0)
    assert(got.getAs[Double]("asof_price") == 7.0)
  }
}
