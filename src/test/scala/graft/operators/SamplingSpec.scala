package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  test("deterministic sample: stable across partitionings, near the rate") {
    val orders = Tables.orders(spark, sf0001)
    val s1 = Sampling.deterministicSample(orders, col("o_orderkey"), 0.2)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(orders.repartition(7), col("o_orderkey"), 0.2)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // identical membership regardless of layout
    val rate = s1.size.toDouble / orders.count()
    assert(rate > 0.15 && rate < 0.25, s"rate=$rate")
  }

  test("mixSources keeps per-source fractions, deterministically") {
    val docs = Tables.documents(spark, sf0001)
    val rates = Map("src0" -> 1.0, "src1" -> 0.5)
    val kept = Sampling.mixSources(docs, col("source"), col("doc_id"), rates, 0.2)
    val bySource = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("src0") == total("src0")) // rate 1.0 keeps everything
    assert(bySource.getOrElse("src1", 0L) < total("src1"))
    // a source's kept SET is independent of every other source's rate:
    // retuning the mix never churns rows you already trained on
    val retuned = Sampling.mixSources(docs, col("source"), col("doc_id"),
      Map("src0" -> 0.1, "src1" -> 0.5), 0.9)
    val ids = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("source") === "src1").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    assert(ids(kept) == ids(retuned))
    intercept[IllegalArgumentException](
      Sampling.mixSources(docs, col("source"), col("doc_id"), Map("a" -> 1.5), 0.2))
  }

  test("targetMix water-fills to the scarcest source and hits the proportions") {
    import spark.implicits._
    // A:100, B:50, C:10 rows, targets 0.5/0.3/0.2 → cap = min(200, 166.7,
    // 50) = 50 → expected keeps ≈ 25/15/10; C is limiting and keeps ALL
    val rows = (1 to 100).map(i => (i.toLong, "A")) ++
      (101 to 150).map(i => (i.toLong, "B")) ++
      (151 to 160).map(i => (i.toLong, "C")) ++
      (161 to 180).map(i => (i.toLong, "D")) // untargeted: dropped
    val df = rows.toDF("doc_id", "source")
    val kept = Sampling.targetMix(df, col("source"), col("doc_id"),
      Map("A" -> 0.5, "B" -> 0.3, "C" -> 0.2))
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("C") == 10L, s"limiting source keeps everything: $bySrc")
    assert(!bySrc.contains("D"), "untargeted sources drop")
    // hash granularity wobbles small samples; bound, don't pin
    assert(bySrc("A") >= 15 && bySrc("A") <= 35, bySrc.toString)
    assert(bySrc("B") >= 8 && bySrc("B") <= 22, bySrc.toString)
    // deterministic under repartitioning
    val kept2 = Sampling.targetMix(df.repartition(7), col("source"), col("doc_id"),
      Map("A" -> 0.5, "B" -> 0.3, "C" -> 0.2))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == kept2)
  }

  test("dataset split covers every row once with stable assignment") {
    val docs = Tables.documents(spark, sf0001)
    val split = Sampling.datasetSplit(docs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.count() == docs.count())
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
    // growing the corpus never reassigns an existing row
    val half = Sampling.datasetSplit(docs.filter(col("doc_id") < 250), col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    val full = split.collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(half.forall { case (k, v) => full(k) == v })
  }

  test("stratified rates: each subgroup converges to the global fraction") {
    val orders = Tables.orders(spark, sf0001)
    val rates = Sampling.deterministicSample(orders, col("o_orderkey"), 0.2)
      .groupBy("o_orderpriority").count().as("s")
      .join(orders.groupBy("o_orderpriority").count().as("t"), "o_orderpriority")
      .select(col("s.count") / col("t.count"))
      .collect().map(_.getDouble(0))
    assert(rates.forall(r => r > 0.1 && r < 0.3), rates.mkString(","))
  }
}
