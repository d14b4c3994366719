package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkTestBase {

  test("dsirWeights separates target-like docs and is layout-stable") {
    val docs = Tables.documents(spark, sf0001)
    val w = Importance.dsirWeights(docs, col("doc_id"), col("text"),
      col("lang") === "en", featureBuckets = 128)
    val joined = w.join(docs.select("doc_id", "lang"), "doc_id").cache()

    // every document in the pool is scored exactly once
    assert(joined.count() == docs.count())

    // the target slice must score higher ON AVERAGE than the rest: that is
    // the operator's entire point (a tie means the models didn't separate)
    val avg = joined.groupBy(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg("dsir_logw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false),
      s"target avg ${avg(true)} must beat pool avg ${avg(false)}")

    // n_tokens matches the whitespace tokenization the score summed over
    val mismatch = joined
      .join(docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("expected")), "doc_id")
      .filter(col("n_tokens") =!= col("expected")).count()
    assert(mismatch == 0)

    // scores are a pure function of content: identical under repartition
    val w2 = Importance.dsirWeights(docs.repartition(7), col("doc_id"),
      col("text"), col("lang") === "en", featureBuckets = 128)
    assert(w.exceptAll(w2).isEmpty && w2.exceptAll(w).isEmpty)
    joined.unpersist()
  }

  test("dsirWeights keep flag equals the sign of the log weight") {
    val docs = Tables.documents(spark, sf0001)
    val w = Importance.dsirWeights(docs, col("doc_id"), col("text"),
      col("lang") === "en")
    assert(w.filter(col("keep") =!= (col("dsir_logw") > 0.0)).count() == 0)
    // degenerate target (empty slice): smoothing must keep every weight
    // finite — no NaN/null anywhere
    val none = Importance.dsirWeights(docs, col("doc_id"), col("text"),
      lit(false))
    assert(none.filter(col("dsir_logw").isNull || isnan(col("dsir_logw"))).count() == 0)
    assert(none.count() == docs.count())
  }
}
