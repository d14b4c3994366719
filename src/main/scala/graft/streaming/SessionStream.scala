package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** Event-time streaming sessionizer: sessions close when the WATERMARK
  * passes their gap boundary, not when more data happens to arrive —
  * `flatMapGroupsWithState` with `EventTimeTimeout`.
  *
  * Per-key state is one open session (4 numbers); closed sessions are
  * emitted exactly once, either when a same-key event lands beyond the gap
  * or when the timeout fires. This is the operator shape for "sessionize an
  * unbounded 100 TB/day clickstream": state size is O(active users), output
  * is append-only.
  */
object SessionStream {

  final case class SessEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)
  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, n_events: Long, sum_value: Double)

  def update(gapMs: Long)(
      userId: Long, events: Iterator[SessEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    def close(s: OpenSession) =
      ClosedSession(userId, new Timestamp(s.startMs), s.n, s.sum)

    if (state.hasTimedOut) {
      val closed = state.getOption.map(close).toIterator
      state.remove()
      closed
    } else {
      val sorted = events.toIndexedSeq.sortBy(_.ts.getTime)
      var open = state.getOption
      val closed = IndexedSeq.newBuilder[ClosedSession]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.lastMs < gapMs =>
            open = Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += close(s)
            open = Some(OpenSession(t, t, 1, e.value))
          case None =>
            open = Some(OpenSession(t, t, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      closed.result().iterator
    }
  }

  /** Wire over a (streaming) Dataset with an event-time watermark. */
  def closedSessions(spark: SparkSession, events: Dataset[SessEvent],
                     gapMinutes: Int = 30,
                     watermarkDelay: String = "10 seconds"): Dataset[ClosedSession] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMinutes * 60000L))
  }

  /** Point the session's state store at RocksDB — the unbounded-clickstream
    * configuration: per-key session state lives off-heap and spills to
    * local disk, so executor heap no longer bounds the number of concurrent
    * open sessions (the HDFS-backed default keeps every key's state in an
    * in-memory map per partition). Changelog checkpointing keeps commit
    * cost proportional to the delta, not the store size. Takes effect for
    * queries STARTED after the call. */
  def useRocksDbStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }
}
