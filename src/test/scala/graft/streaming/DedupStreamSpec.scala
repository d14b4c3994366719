package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class RawEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                          event_type: String, value: Double, props: String)

class DedupStreamSpec extends SparkTestBase {

  test("streaming dropDuplicates suppresses replays across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[RawEvent]
    // dedupStream expects ingest-normalized TimestampType event time
    def ev(id: Long) = RawEvent(id, new java.sql.Timestamp(id * 1000L), 1L, "click", 1.0, "{}")
    val q = EventStream.dedupStream(source.toDS().toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      source.addData(ev(1), ev(2), ev(1)) // intra-batch duplicate
      q.processAllAvailable()
      source.addData(ev(2), ev(3))        // cross-batch replay of 2
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}
