package graft

import org.apache.spark.sql.functions._

/** Invariants of the composed prep pipeline (prep1): conservation of
  * documents across stages and agreement with the stage operators it is
  * built from — the oracle pins exact values, this pins the algebra. */
class PrepPipelineSpec extends SparkTestBase {

  test("prep1: split masses add up to the deduped keep-set, all splits present") {
    val out = Queries.prep1CorpusPrep(spark, sf0001).collect()
    assert(out.map(_.getString(0)).toSet == Set("train", "val", "test"))
    val total = out.map(_.getLong(1)).sum
    // recompute through the individual operators: t10 keep-verdict, then
    // distinct text, then count
    val t10 = Queries.t10CorpusFilter(spark, sf0001)
    val expect = t10.filter(col("keep"))
      .join(Tables.documents(spark, sf0001), "doc_id")
      .select(col("text")).distinct().count()
    assert(total == expect, s"pipeline kept $total docs, stage-wise recompute $expect")
    // train holds the bulk under the 0.9/0.05/0.05 split
    val train = out.find(_.getString(0) == "train").get.getLong(1)
    assert(train > total / 2)
  }
}
