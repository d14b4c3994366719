package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.operators.Windows

class EventStreamSpec extends SparkTestBase {

  test("streaming windowed aggregation equals the batch twin (parity)") {
    val batch = Windows.tumbling(Tables.events(spark, sf0001))
    val streamed = EventStream.runWindowedOverFixture(spark, sf0001)
    assertSameRows(batch, streamed)
  }

  test("streaming CDC merge converges to the batch per-user argmax") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val batch = Tables.events(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
    val merged = EventStream.runCdcMergeOverFixture(spark, sf0001)
    assertSameRows(batch, merged)
  }
}
