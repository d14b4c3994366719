package graft.streaming

import graft.SparkTestBase
import graft.streaming.SessionStream.SessEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionStreamSpec extends SparkTestBase {

  private def ts(min: Int) = new Timestamp(3600_000L + min * 60000L)

  test("sessions close via gap-split and via event-time timeout") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[SessEvent]
    val q = SessionStream.closedSessions(spark, source.toDS(), gapMinutes = 30,
        watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("closed_sessions").start()
    try {
      // user 1: two events 5 min apart (one session)
      source.addData(SessEvent(1, ts(0), 1.0), SessEvent(1, ts(5), 2.0))
      q.processAllAvailable()
      // user 1 again 90 min later: gap-split closes the first session NOW
      source.addData(SessEvent(1, ts(95), 4.0))
      q.processAllAvailable()
      // other user far in the future: watermark jumps past 95+30 → timeout
      // closes user 1's open second session on the following batch
      source.addData(SessEvent(2, ts(500), 8.0))
      q.processAllAvailable()
      source.addData(SessEvent(3, ts(501), 0.5)) // one more batch to fire timeouts
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("closed_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(out.contains((1L, ts(0), 2L, 3.0)), out.mkString(", "))   // gap-split close
    assert(out.contains((1L, ts(95), 1L, 4.0)), out.mkString(", "))  // timeout close
  }

  test("sessionizer runs unchanged on the RocksDB state store") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    SessionStream.useRocksDbStateStore(spark)
    try {
      val source = MemoryStream[SessEvent]
      val q = SessionStream.closedSessions(spark, source.toDS(), gapMinutes = 30,
          watermarkDelay = "0 seconds")
        .writeStream.outputMode("append").format("memory")
        .queryName("closed_sessions_rocksdb").start()
      try {
        source.addData(SessEvent(1, ts(0), 1.0), SessEvent(1, ts(5), 2.0))
        q.processAllAvailable()
        source.addData(SessEvent(1, ts(95), 4.0)) // gap-split closes session 1
        q.processAllAvailable()
        // the running query really is on RocksDB, not the HDFS default
        assert(q.lastProgress.stateOperators.exists(
          _.customMetrics.containsKey("rocksdbFilesCopied")), q.lastProgress)
      } finally q.stop()
      val out = spark.table("closed_sessions_rocksdb")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      assert(out.contains((1L, ts(0), 2L, 3.0)), out.mkString(", "))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
