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

  test("tumbling windows are day-aligned") {
    val ev = Tables.events(spark, sf0001)
    val starts = Windows.tumbling(ev).select("window_start").distinct().collect()
      .map(_.getTimestamp(0))
    starts.foreach(t => assert(t.toInstant.toString.endsWith("T00:00:00Z"), t.toString))
  }
}
