package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkTestBase {

  test("session_window and lag-based sessionization agree on fixture events") {
    val ev = Tables.events(spark, sf0001)
    assertSameRows(Windows.sessions(ev), Windows.sessionsViaLag(ev))
  }

  test("tumbling window counts partition the event total") {
    val ev = Tables.events(spark, sf0001)
    val total = ev.count()
    val windowed = Windows.tumbling(ev).agg(sum("n_events")).collect()(0).getLong(0)
    assert(windowed == total)
  }

  test("funnel requires strict stage order and counts reached stages") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: purchase BEFORE the first click -> stalls at stage 2
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 09:01:00"), "purchase"),
      (2L, ts("2024-01-01 09:02:00"), "click"),
      // user 3: never viewed -> excluded entirely
      (3L, ts("2024-01-01 08:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Windows.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("reached")).toMap
    assert(got == Map(1L -> 3L, 2L -> 2L))
  }

  test("tumbling windows are day-aligned") {
    val ev = Tables.events(spark, sf0001)
    val starts = Windows.tumbling(ev).select("window_start").distinct().collect()
      .map(_.getTimestamp(0))
    starts.foreach(t => assert(t.toInstant.toString.endsWith("T00:00:00Z"), t.toString))
  }
}
