package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class MinHashAggregatorSpec extends SparkTestBase {

  test("typed Aggregator sketch equals the declarative 64-column sketch") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).limit(100)
    val declarative = Dedup.minhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val agg = new MinHashAggregator(64)
    val typed = Dedup.shingles(docs, 3)
      .select(col("doc_id"), explode(col("shingles")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("minhash"))
      .collect().map { case (id, sig) => id -> sig.toVector }.toMap
    assert(typed == declarative)
  }
}
