package graft.operators

import graft.functions.portableRound
import org.apache.spark.sql.{Column, DataFrame}
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
  /** POSITIONAL inverted-index build — [[invertedIndexStats]]' model
    * extended with within-document position lists, the structure
    * phrase/proximity retrieval ([[phraseSearch]]) requires and
    * bag-of-words scoring (t12 BM25) does not. Per term: df, cf, the
    * doc-gap byte cost (ii1's exact model), the POSITION byte cost
    * (per document: first position absolute, then d-gaps, same varint
    * ladder — the Lucene-style prx stream), their total, and
    * `fatten_ratio` = total/doc-gaps — the measured factor by which
    * storing positions fattens the postings exchange.
    *
    * Exactness: pure integer byte algebra; only `fatten_ratio` divides,
    * snapped to 1e-6.
    *
    * Scale shape: ONE (term, doc) aggregation now additionally carries
    * each posting's position list (bounded by the doc's own tf — this
    * is the honest fattening the ratio column measures), then one
    * term-keyed rollup; position byte costs fold per (term, doc) BEFORE
    * the term rollup, so the second exchange carries one long per
    * posting, not the positions. */
  def positionalIndexStats(documents: DataFrame, minDf: Long = 5): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val vbyte = (g: Column) => when(g < 128L, 1L).when(g < 16384L, 2L)
      .when(g < 2097152L, 3L).when(g < 268435456L, 4L).otherwise(5L)
    // exact varint cost of a sorted BIGINT list under first-absolute +
    // d-gap encoding
    val gapBytes = (xs: Column) => aggregate(
      transform(sequence(lit(1), size(xs)), i =>
        when(i === 1, element_at(xs, 1))
          .otherwise(element_at(xs, i) - element_at(xs, i - 1))),
      lit(0L), (acc, g) => acc + vbyte(g))
    val tp = documents
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "term")))
      .select(col("doc_id"), col("term"),
        (col("p0") + 1).cast("long").as("p"))
    val td = tp.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("p"))).as("ps"))
      .withColumn("pos_bytes", gapBytes(col("ps")))
    td.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        sort_array(collect_list(col("doc_id"))).as("ds"),
        sum(col("pos_bytes")).as("bytes_pos"))
      .filter(col("df") >= minDf)
      .withColumn("bytes_docs", gapBytes(col("ds")))
      .select(col("term"), col("df"), col("cf"),
        col("bytes_docs"), col("bytes_pos"),
        (col("bytes_docs") + col("bytes_pos")).as("bytes_total"),
        (floor((col("bytes_docs") + col("bytes_pos")).cast("double")
          / col("bytes_docs").cast("double") * 1000000.0 + 0.5) / 1000000.0)
          .as("fatten_ratio"))
  }

  /** Phrase + proximity retrieval over positional postings — the query
    * leg [[positionalIndexStats]] builds for. The query phrase is the
    * corpus's TOP trigram (count desc, lexicographic tiebreak — derived
    * IN-PLAN, so the query is deterministic and non-empty at every SF);
    * for every document containing all three terms: the per-term tfs,
    * `phrase_count` (positions align: p, p+1, p+2 — exact phrase
    * occurrences), `min_window` (the smallest token span containing an
    * occurrence of BOTH of the first two terms, the classic proximity
    * score), and the `is_phrase_match` verdict. If the phrase repeats a
    * term, its postings serve both slots (so a self-pair gives
    * min_window = 1) — the oracle's join semantics, mirrored.
    *
    * Scale shape: the trigram argmax is one map-side-combinable count +
    * a TakeOrdered(1); the 1-row phrase BROADCASTS and prunes the token
    * stream to the three query terms before any aggregation (the
    * postings fetch — at 100 TB this is the index seek, here the
    * broadcast-filtered scan); all scoring is in-row on doc-bounded
    * position lists — phrase alignment via membership tests, proximity
    * via ONE sorted merge walk (O(|p1|+|p2|), not the |p1|·|p2| pair
    * enumeration). No corpus-sized collect, no global sort. */
  /** The corpus's top trigram as a broadcast 1-row `(t1, t2, t3)` frame
    * plus, per document, the sorted position lists of each query term
    * (empty where the term is absent) — the shared postings fetch behind
    * [[phraseSearch]] and [[proximityRank]]. The broadcast phrase prunes
    * the token stream to the three query terms BEFORE any aggregation. */
  private def phrasePostings(documents: DataFrame): DataFrame = {
    val phrase = Dedup.shingleStream(documents, 3, distinctPerDoc = false)
      .groupBy(col("sg")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("sg").asc).limit(1)
      .select(split(col("sg"), " ").as("q"))
      .select(element_at(col("q"), 1).as("t1"),
        element_at(col("q"), 2).as("t2"), element_at(col("q"), 3).as("t3"))
    val tp = documents
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "term")))
      .select(col("doc_id"), col("term"),
        (col("p0") + 1).cast("long").as("p"))
    tp.crossJoin(broadcast(phrase))
      .filter(col("term") === col("t1") || col("term") === col("t2")
        || col("term") === col("t3"))
      .groupBy(col("doc_id"), col("t1"), col("t2"), col("t3"))
      .agg(
        sort_array(collect_list(when(col("term") === col("t1"), col("p"))))
          .as("p1"),
        sort_array(collect_list(when(col("term") === col("t2"), col("p"))))
          .as("p2"),
        sort_array(collect_list(when(col("term") === col("t3"), col("p"))))
          .as("p3"))
  }

  /** The minimal token span containing one occurrence from each of two
    * sorted position lists: one walk over the tag-merged sorted stream,
    * carrying the last-seen position of each side and the best gap —
    * O(|p1| + |p2|) per row, not the |p1|·|p2| pair enumeration. */
  private[graft] def mergeWalkWindow(p1: Column, p2: Column): Column = {
    val tagged = array_sort(concat(
      transform(p1, a => struct(a.as("p"), lit(1).as("w"))),
      transform(p2, b => struct(b.as("p"), lit(2).as("w")))))
    aggregate(tagged,
      struct(lit(null).cast("long").as("l1"), lit(null).cast("long").as("l2"),
        lit(Long.MaxValue).as("best")),
      (acc, x) => {
        val p = x.getField("p"); val w = x.getField("w")
        val best = least(acc.getField("best"),
          when(w === 2 && acc.getField("l1").isNotNull,
            p - acc.getField("l1")),
          when(w === 1 && acc.getField("l2").isNotNull,
            p - acc.getField("l2")))
        struct(when(w === 1, p).otherwise(acc.getField("l1")).as("l1"),
          when(w === 2, p).otherwise(acc.getField("l2")).as("l2"),
          best.as("best"))
      },
      acc => acc.getField("best") + 1L)
  }

  /** Conjunctive proximity-boosted BM25 over the [[phrasePostings]]
    * query — the ranked-retrieval leg phrase matching ([[phraseSearch]])
    * and bag-of-words scoring (t12) bracket: documents containing ALL
    * three query terms score BM25 (corpus-global df/avgdl stats, t12's
    * k1/b) PLUS a proximity boost 0.5 / min_window(t1, t2) — the classic
    * "terms near each other beat terms far apart" re-ranking. Both
    * components snap to the 1e-4 grid and fuse as exact micro-units, so
    * the final score replays digit-exact. A phrase that repeats a term
    * scores that term's postings in each slot it occupies (symmetric in
    * the oracle). Scale shape: [[phrasePostings]]' broadcast-pruned
    * seek + two 1-row broadcast stats frames + one doc-length join —
    * no new exchange class. */
  def proximityRank(documents: DataFrame, k1: Double = 1.2,
                    b: Double = 0.75): DataFrame = {
    val toks = split(col("text"), " ")
    val posts = phrasePostings(documents)
    val stats = documents.agg(count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("tot_tokens"))
    val dfs = posts.agg(
      sum((size(col("p1")) > 0).cast("long")).as("df1"),
      sum((size(col("p2")) > 0).cast("long")).as("df2"),
      sum((size(col("p3")) > 0).cast("long")).as("df3"))
    val dl = documents.select(col("doc_id"),
      size(toks).cast("double").as("dl"))
    val avgdl = col("tot_tokens").cast("double") / col("n_docs").cast("double")
    def termScore(tf: Column, df: Column): Column = {
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - df.cast("double") + 0.5)
          / (df.cast("double") + 0.5))
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    }
    val bm25 = portableRound(
      termScore(size(col("p1")).cast("double"), col("df1"))
        + termScore(size(col("p2")).cast("double"), col("df2"))
        + termScore(size(col("p3")).cast("double"), col("df3")), 4)
    val minWindow = mergeWalkWindow(col("p1"), col("p2"))
    posts
      .filter(size(col("p1")) > 0 && size(col("p2")) > 0
        && size(col("p3")) > 0)
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfs))
      .withColumn("bm25", bm25)
      .withColumn("min_window", minWindow)
      .withColumn("prox_boost",
        portableRound(lit(0.5) / col("min_window").cast("double"), 4))
      // grid values fuse as exact micro-units (the rrf1 discipline)
      .withColumn("score",
        (floor(col("bm25") * 10000 + 0.5).cast("long")
          + floor(col("prox_boost") * 10000 + 0.5).cast("long"))
          .cast("double") / 10000.0)
      .select(col("doc_id"), col("t1"), col("t2"), col("t3"),
        col("bm25"), col("min_window"), col("prox_boost"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  def phraseSearch(documents: DataFrame): DataFrame = {
    val perDoc = phrasePostings(documents)
      .filter(size(col("p1")) > 0 && size(col("p2")) > 0
        && size(col("p3")) > 0)
    val phraseCount = size(filter(col("p1"), a =>
      array_contains(col("p2"), a + 1) && array_contains(col("p3"), a + 2)))
    val minWindow = mergeWalkWindow(col("p1"), col("p2"))
    perDoc
      .select(col("doc_id"), col("t1"), col("t2"), col("t3"),
        size(col("p1")).cast("long").as("tf1"),
        size(col("p2")).cast("long").as("tf2"),
        size(col("p3")).cast("long").as("tf3"),
        phraseCount.cast("long").as("phrase_count"),
        minWindow.as("min_window"))
      .withColumn("is_phrase_match", col("phrase_count") > 0)
      .orderBy(col("phrase_count").desc, col("min_window").asc,
        col("doc_id").asc)
  }

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

  /** RAG context assembly — the query-time data product a
    * retrieval-augmented pipeline actually ships: retrieve the top-k
    * chunks per query, then pack them IN RANK ORDER under a token
    * budget (a chunk enters the context iff the running token total
    * stays within budget — rank-3 can be skipped while rank-1/2 stay),
    * and account the result per query: chunks retrieved/packed, context
    * tokens, the true chunk's rank (known-item eval, 0 = missed), and
    * the assembled context string itself — oracle-compared byte for
    * byte.
    *
    * Retrieval here is exact cosine over hashed bag-of-words count
    * vectors (the hashing-vectorizer; counts are exact integers, so
    * dot and norms² are exact and only sqrt/divide are IEEE ops —
    * digit-identical in any engine). The exact form pins the semantics;
    * production swaps the scorer for the ANN index route (pq3) and a
    * learned encoder, with the pack-and-account stage unchanged — the
    * lab1/sim1 exact-vs-ANN split.
    *
    * Scale shape: the query side BROADCASTS (a query load is tiny
    * against a 100 TB chunk store — phr1's rationale) and chunks stream
    * through one codegen'd score projection; per-query windows run over
    * ≤ k survivors... the top-k cut itself partitions by q_id, so the
    * shuffle carries (q_id, cid, score) triples only. The packed
    * context string materializes once per query, never per pair. */
  def ragAssembleContexts(chunks: DataFrame, queries: DataFrame,
                          dims: Int = 16, k: Int = 3,
                          budget: Int = 48): DataFrame = {
    require(dims >= 2 && dims <= 1024 && k >= 1 && budget >= 1,
      s"bad params: dims=$dims k=$k budget=$budget")
    def feats(df: DataFrame, textCol: String, pfx: String) =
      df.withColumn("_h", graft.functions.hashed_bag_counts(col(textCol), dims))
        .select(df.columns.map(col) ++
          (1 to dims).map(j =>
            element_at(col("_h"), j).cast("double").as(s"$pfx$j")): _*)
    val cf = feats(chunks, "chunk_text", "c")
    val qf = feats(queries, "query_text", "q")
    val dot = (1 to dims).map(j => col(s"c$j") * col(s"q$j")).reduce(_ + _)
    val na = sqrt((1 to dims).map(j => col(s"c$j") * col(s"c$j")).reduce(_ + _))
    val nb = sqrt((1 to dims).map(j => col(s"q$j") * col(s"q$j")).reduce(_ + _))
    val scored = cf.crossJoin(broadcast(qf))
      .select(col("q_id"), col("true_cid"), col("cid"), col("n_tokens"),
        col("chunk_text"), portableRound(dot / (na * nb), 4).as("score"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("cid").asc)
    val topk = scored
      .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= k)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("rank").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    topk
      .withColumn("in_ctx", sum(col("n_tokens")).over(wCum) <= budget)
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_retrieved"),
        sum(when(col("in_ctx"), 1L).otherwise(0L)).as("n_in_context"),
        sum(when(col("in_ctx"), col("n_tokens")).otherwise(0L))
          .as("context_tokens"),
        max(when(col("cid") === col("true_cid"), col("rank")).otherwise(0))
          .cast("long").as("hit_rank"),
        array_join(transform(
            array_sort(collect_list(when(col("in_ctx"),
              struct(col("rank"), col("chunk_text"))))),
            s => s.getField("chunk_text")), " | ").as("context"))
  }

  /** FAITH1 — RAG groundedness / faithfulness scoring: the fraction of a
    * generated answer's n-gram instances supported by the retrieved
    * context (the n-gram-support form of RAGAS faithfulness, Es et al.
    * 2023, and of attributable-to-identified-sources, Rashkin et al.
    * 2021) — the eval a RAG data product gates its outputs on, and the
    * filter a synthetic-data pipeline runs before keeping
    * model-generated answers. Expects (q_id, context); the ANSWER is
    * synthesized deterministically (the conv1/wm1 plant discipline):
    * the context's first 12 tokens (the grounded mass a faithful model
    * would copy) plus 2 + q_id % 4 hallucinated tokens that appear
    * nowhere in the context — so the measured faithfulness varies per
    * query in a known band and ungrounded mass is planted, not assumed.
    *
    * Exactness: grams are [[graft.functions.shingle_hashes]] instances
    * on both operands (the mem1 pattern: hash-counted in Spark,
    * string-counted in the oracle — counts agree absent md5 collision);
    * the ratio is one IEEE division, micro-rounded. Scale: in-row
    * filtered-array arithmetic on the per-query frame — ZERO shuffles
    * beyond the context assembly's own bill. */
  def ragFaithfulness(contexts: DataFrame, n: Int = 3,
                      faithfulThresh: Double = 0.6): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    val noiseN = lit(2L) + col("q_id") % 4
    val noise = array_join(transform(sequence(lit(0L), noiseN - 1),
      i => concat(lit("halluc_"), col("q_id").cast("string"), lit("_"),
        i.cast("string"))), " ")
    val answer = concat(
      array_join(slice(split(col("context"), " "), 1, 12), " "),
      lit(" "), noise)
    val withA = contexts.withColumn("answer", answer)
      .withColumn("ag", graft.functions.shingle_hashes(col("answer"), n))
      .withColumn("cg", graft.functions.shingle_hashes(col("context"), n))
    val grounded = size(filter(col("ag"),
      g => array_contains(col("cg"), g))).cast("long")
    val faith = portableRound(
      grounded.cast("double") / size(col("ag")), 6)
    withA.select(col("q_id"),
      size(split(col("answer"), " ")).cast("long").as("answer_tokens"),
      (noiseN).cast("long").as("n_hallucinated"),
      size(col("ag")).cast("long").as("n_answer_grams"),
      grounded.as("n_grounded"),
      faith.as("faithfulness"),
      (faith >= faithfulThresh).as("faithful"))
  }
}
