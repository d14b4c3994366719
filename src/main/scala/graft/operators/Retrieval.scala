package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-list fusion for hybrid retrieval — combining a lexical arm (BM25,
  * [[TextAnalysis.bm25]]) with a dense arm (embedding cosine,
  * [[Similarity.bruteForceTopK]] or its ANN scale paths) is the standard
  * two-tower retrieval setup, and reciprocal-rank fusion (Cormack,
  * Clarke & Büttcher, SIGIR 2009, public) is the classic way to merge
  * them without score calibration: each arm contributes 1/(k0 + rank),
  * rank-only, so wildly different score scales fuse cleanly.
  *
  * The reference has no retrieval surface at all; this extends the t12 /
  * sim1–sim4 families into the query-time composition a RAG or
  * curation-search pipeline actually runs.
  */
object Retrieval {

  /** Truncate a scored list to its global top-`k` and assign dense 1-based
    * ranks (score desc, id asc — a total order as long as `score` is
    * already snapped to a portable grid, which every arm operator here
    * guarantees).
    *
    * Scale shape: the global cut is `orderBy(...).limit(k)` — Spark's
    * TakeOrdered, a per-partition k-heap that ships only k rows per
    * partition, never a full sort. The `row_number` window after it is
    * unpartitioned BY DESIGN: it runs on exactly k surviving rows (a
    * constant), not on the corpus, so the single-partition window is O(k)
    * at any scale. */
  def topKRanks(scored: DataFrame, score: org.apache.spark.sql.Column,
                id: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_s").desc, col("doc_id").asc)
    scored.select(id.as("doc_id"), score.as("_s"))
      .orderBy(col("_s").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("rank"))
  }

  /** Fuse ranked arms by reciprocal rank. Each arm is `(doc_id, rank)`
    * with rank 1-based; a document absent from an arm contributes 0 (the
    * standard top-k-lists semantics — arms are expected to be truncated
    * to a fixed depth upstream).
    *
    * Determinism: contributions snap to 1e-8 units and fold as BIGINTs —
    * exact in any combine order and for any number of arms (a float sum
    * would be associativity-dependent beyond two arms). Ties in the fused
    * score break on doc_id, so the top-k cut is a total order.
    *
    * Scale shape: arms at 100 TB are already k·|queries|-sized (the heavy
    * lifting happened in the arm operators — BM25's broadcast stats, the
    * ANN bucket join); fusion itself is a union + one doc_id-keyed
    * aggregation + a TakeOrdered heap, never a global sort. */
  def rrfFuse(arms: Seq[DataFrame], k0: Int = 60, topK: Int = 20): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one arm")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val micro = arms.map(_.select(col("doc_id"),
      floor(lit(1.0e8) / (lit(k0).cast("double") + col("rank").cast("double")) + 0.5)
        .cast("long").as("_m")))
    micro.reduce(_ union _)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_arms"), sum(col("_m")).as("_ms"))
      .select(col("doc_id"), col("n_arms"),
        (col("_ms").cast("double") / 1.0e8).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Inverted-index BUILD with the classic postings compression model —
    * the index-construction leg the scoring operators (t12 BM25, rrf1)
    * assume exists: per term, document frequency, collection frequency,
    * the sorted postings extremes, and the exact byte cost of the
    * d-gap + varint encoding every production index (Lucene-style VInt)
    * uses, against the 8-bytes-per-id raw baseline.
    *
    * Exactness: everything is integer arithmetic — postings sort inside
    * an array, gaps and the varint byte ladder (<2^7 → 1B, <2^14 → 2B,
    * <2^21 → 3B, <2^28 → 4B, else 5B) fold as exact BIGINTs; only the
    * final compression ratio divides, snapped to 1e-6.
    *
    * Shape: one (term, doc) aggregation (the data-sized exchange; tf
    * combines map-side), then one term-keyed aggregation whose
    * collect_list is each term's OWN postings list — the honest cost of
    * index build (real deployments shard hot terms' postings by doc
    * range; the per-(term, shard) shape is identical). `minDf` keeps the
    * report vocabulary-bounded. */
  def invertedIndexStats(documents: DataFrame, minDf: Long = 5): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val td = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val p = td.groupBy(col("term")).agg(
      count(lit(1)).as("df"), sum(col("tf")).as("cf"),
      min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"),
      sort_array(collect_list(col("doc_id"))).as("ds"))
    val bytesDelta = expr(
      """aggregate(
        |  transform(sequence(1, size(ds)), i ->
        |    CASE WHEN i = 1 THEN element_at(ds, 1)
        |         ELSE element_at(ds, i) - element_at(ds, i - 1) END),
        |  CAST(0 AS BIGINT),
        |  (acc, g) -> acc + CASE WHEN g < 128 THEN 1
        |                         WHEN g < 16384 THEN 2
        |                         WHEN g < 2097152 THEN 3
        |                         WHEN g < 268435456 THEN 4
        |                         ELSE 5 END)""".stripMargin)
    p.filter(col("df") >= minDf)
      .withColumn("bytes_delta", bytesDelta)
      .select(col("term"), col("df"), col("cf"),
        col("first_doc"), col("last_doc"), col("bytes_delta"),
        (col("df") * 8).as("bytes_raw"),
        (floor(col("bytes_delta").cast("double") /
          (col("df") * 8).cast("double") * 1000000.0 + 0.5) / 1000000.0)
          .as("ratio"))
  }
}
