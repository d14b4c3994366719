package graft.streaming

import graft.SparkTestBase
import graft.streaming.StatefulSessions.{UserEvent, UserTotals}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulSessionsSpec extends SparkTestBase {

  test("flatMapGroupsWithState accumulates per-user totals across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[UserEvent]
    val q = StatefulSessions.runningTotals(spark, source.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("stateful_totals").start()
    try {
      source.addData(UserEvent(1, "click", 1.0), UserEvent(1, "view", 2.0),
        UserEvent(2, "click", 5.0))
      q.processAllAvailable()
      source.addData(UserEvent(1, "purchase", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("stateful_totals").as[UserTotals].collect()
    // batch 1 emissions
    assert(out.contains(UserTotals(1, 2, 3.0)))
    assert(out.contains(UserTotals(2, 1, 5.0)))
    // batch 2: user 1's state carried forward
    assert(out.contains(UserTotals(1, 3, 7.0)))
  }

  test("matchPattern: hits span batches once, state stays bounded at k-1") {
    import StatefulSessions.{TypedEvent, matchPattern}
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val pat = Seq("a", "b", "c")
    def ev(id: Long, ts: Long, t: String) = TypedEvent(1L, id, ts, t)
    def mkState(prev: Option[Seq[TypedEvent]], batchMs: Long) =
      TestGroupState.create[Seq[TypedEvent]](
        prev.map(Optional.of[Seq[TypedEvent]]).getOrElse(Optional.empty()),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
        batchMs, Optional.empty[Long](), hasTimedOut = false)
    // batch 1 ends mid-pattern: no hit, suffix carried
    val s1 = mkState(None, 1000L)
    val h1 = matchPattern(pat)(1L, Iterator(ev(1, 1, "a"), ev(2, 2, "b")), s1).toSeq
    assert(h1.isEmpty && s1.get.map(_.event_id) == Seq(1L, 2L))
    // batch 2 completes it: ONE hit, anchored at the batch-1 event
    val s2 = mkState(Some(s1.get), 2000L)
    val h2 = matchPattern(pat)(1L, Iterator(ev(3, 3, "c")), s2).toSeq
    assert(h2.map(_.start_event_id) == Seq(1L))
    assert(s2.get.length == 2, "state bounded at k-1")
    // batch 3: nothing new completes -> no re-emission of the old hit
    val s3 = mkState(Some(s2.get), 3000L)
    assert(matchPattern(pat)(1L, Iterator(ev(4, 4, "a")), s3).isEmpty)
  }

  test("batch Dataset runs through the same stateful transformation") {
    import spark.implicits._
    val ds = Seq(UserEvent(7, "click", 1.5), UserEvent(7, "view", 2.5)).toDS()
    val got = StatefulSessions.runningTotals(spark, ds).collect()
    assert(got.toSeq == Seq(UserTotals(7, 2, 4.0)))
  }
}
