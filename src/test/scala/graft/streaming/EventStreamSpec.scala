package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.operators.Windows

class EventStreamSpec extends SparkTestBase {

  test("streaming windowed aggregation equals the batch twin (parity)") {
    val batch = Windows.tumbling(Tables.events(spark, sf0001))
    val streamed = EventStream.runWindowedOverFixture(spark, sf0001)
    assertSameRows(batch, streamed)
  }
}
