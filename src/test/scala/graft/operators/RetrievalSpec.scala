package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {

  test("topKRanks: dense 1-based ranks on the global top-k, layout-stable") {
    val docs = Tables.documents(spark, sf0001)
    val scored = docs.select(col("doc_id"), col("n_chars").cast("double").as("s"))
    val r = Retrieval.topKRanks(scored, col("s"), col("doc_id"), 25)
    val rows = r.collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(rows.size == 25 && rows.values.toSeq.sorted == (1 to 25))
    // rank 1 is the max-score doc with the smallest id among ties
    val best = docs.orderBy(col("n_chars").desc, col("doc_id").asc)
      .select("doc_id").head.getLong(0)
    assert(rows.find(_._2 == 1).get._1 == best)
    val r2 = Retrieval.topKRanks(scored.repartition(13), col("s"), col("doc_id"), 25)
    assert(r.exceptAll(r2).isEmpty && r2.exceptAll(r).isEmpty)
  }

  test("rrfFuse: rank-1-everywhere doc wins; absent arms contribute zero") {
    import spark.implicits._
    // doc 7 is rank 1 in both arms → maximal possible fused score
    val a = Seq((7L, 1), (1L, 2), (2L, 3)).toDF("doc_id", "rank")
    val b = Seq((7L, 1), (3L, 2), (1L, 3)).toDF("doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), k0 = 60, topK = 10).collect()
    assert(fused.head.getLong(0) == 7L)
    assert(fused.head.getLong(1) == 2L) // present in both arms
    val expected = math.floor(1.0e8 / 61.0 + 0.5) * 2 / 1.0e8
    assert(math.abs(fused.head.getDouble(2) - expected) < 1e-12)
    // doc 2 appears once: exactly one arm counted
    val d2 = fused.find(_.getLong(0) == 2L).get
    assert(d2.getLong(1) == 1L)
    // fused order is (score desc, doc_id asc) — doc 1 (ranks 2+3) beats
    // doc 3 (rank 2 only)
    val order = fused.map(_.getLong(0)).toSeq
    assert(order.indexOf(1L) < order.indexOf(3L))
  }

  test("hybrid fusion query returns 20 rows with both arms represented") {
    val df = graft.Queries.all("rrf1_hybrid_fusion")(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == 20)
    // at least one fused doc drew from two arms (lexical AND dense)
    assert(rows.exists(_.getLong(1) == 2L))
    assert(rows.forall(_.getDouble(2) > 0.0))
  }

  test("invertedIndexStats: hand-computed varint postings, ratio bounds " +
    "on the fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // term "x": docs [1, 2, 130] → gaps [1, 1, 128] → 1 + 1 + 2 = 4 bytes
    val tiny = Seq((1L, "x y x"), (2L, "x"), (130L, "x"),
      (5L, "y"), (6L, "y"), (300L, "y z z z z"))
      .toDF("doc_id", "text")
    val got = Retrieval.invertedIndexStats(tiny, minDf = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))).toMap
    assert(got("x") == ((3L, 4L, 1L, 130L, 4L, 24L, 0.166667)), got.toString)
    // y: once in each of docs [1, 5, 6, 300] → gaps [1, 4, 1, 294] →
    // 1+1+1+2 = 5 bytes
    assert(got("y") == ((4L, 4L, 1L, 300L, 5L, 32L, 0.15625)), got.toString)
    assert(!got.contains("z"), "df filter must drop single-doc terms")
    // fixture: per-entry varint is 1..5 bytes vs 8 raw → ratio in bounds
    val fix = Retrieval.invertedIndexStats(
      graft.Tables.documents(spark, sf0001)).collect()
    assert(fix.nonEmpty)
    fix.foreach { r =>
      val (df, delta, raw, ratio) =
        (r.getLong(1), r.getLong(5), r.getLong(6), r.getDouble(7))
      assert(df >= 5 && raw == 8 * df && r.getLong(3) <= r.getLong(4))
      assert(delta >= df && delta <= 5 * df, s"term ${r.getString(0)}")
      assert(ratio >= 0.125 && ratio <= 0.625)
    }
    // dense terms compress best: the highest-df term beats the average
    val best = fix.maxBy(_.getLong(1))
    assert(best.getDouble(7) <= fix.map(_.getDouble(7)).sum / fix.length)
  }
}
