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

  test("positionalIndexStats: hand-computed doc-gap + position-gap bytes " +
    "and fatten ratio") {
    import spark.implicits._
    // term "x" in doc 1 at positions [1, 3, 300]: pos bytes = v(1)+v(2)
    //   +v(297) = 1+1+2 = 4; doc 2 at [1]: 1; doc 130 at [1]: 1 → 6
    // doc gaps [1, 1, 128] → 1+1+2 = 4 (ii1's number)
    val pad = (4 to 299).map(_ => "f").mkString(" ")
    val tiny = Seq((1L, s"x y x $pad x"), (2L, "x a b"), (130L, "x c d"),
      (5L, "y"), (6L, "y"), (300L, "y"))
      .toDF("doc_id", "text")
    val got = Retrieval.positionalIndexStats(tiny, minDf = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    // (df, cf, bytes_docs, bytes_pos, bytes_total, fatten_ratio)
    assert(got("x") == ((3L, 5L, 4L, 6L, 10L, 2.5)), got.toString)
    // y: docs [1, 5, 6, 300] (doc 1 has y at pos 2) → doc gaps
    // [1,4,1,294] = 1+1+1+2 = 5 bytes; pos bytes 1 per doc → 4
    assert(got("y") == ((4L, 4L, 5L, 4L, 9L, 1.8)), got.toString)
    // fixture invariants: positions always fatten (ratio > 1), cf bounds
    // the position-byte cost (1..5 bytes per occurrence)
    val fix = Retrieval.positionalIndexStats(
      graft.Tables.documents(spark, sf0001)).collect()
    assert(fix.nonEmpty)
    fix.foreach { r =>
      val (df, cf, bd, bp, bt, ratio) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(cf >= df && bt == bd + bp)
      assert(bp >= cf && bp <= 5 * cf, s"term ${r.getString(0)}")
      assert(ratio > 1.0)
    }
  }

  test("proximityRank: conjunctive candidates, micro-unit fusion, and " +
    "proximity ordering between equal-BM25 docs") {
    import spark.implicits._
    // same top trigram "p q r"; docs 60/61 have IDENTICAL term counts
    // and lengths (equal BM25) but different (p,q) windows — proximity
    // must order 60 before 61
    val docs = Seq(
      (10L, "p q r z p q r"),
      (20L, "p q r a b c"),
      (30L, "z p q r y"),
      (60L, "p q z z z z r a"),   // window(p,q) = 2
      (61L, "p z q z z z r a"),   // window(p,q) = 3
      (99L, "p q x y"))           // missing r → excluded (conjunctive)
      .toDF("doc_id", "text")
    val got = Retrieval.proximityRank(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(99L), got.keySet.toString)
    assert(got.keySet == Set(10L, 20L, 30L, 60L, 61L))
    val (r60, r61) = (got(60L), got(61L))
    // equal BM25 (same tfs, same dl), boost differs by the window
    assert(r60.getDouble(4) == r61.getDouble(4), s"$r60 vs $r61")
    assert(r60.getLong(5) == 2L && r61.getLong(5) == 3L)
    assert(r60.getDouble(6) == 0.25 && r61.getDouble(6) == 0.1667)
    // score = exact micro-unit fusion of the two grid components
    got.values.foreach { r =>
      val fused = (math.floor(r.getDouble(4) * 10000 + 0.5).toLong
        + math.floor(r.getDouble(6) * 10000 + 0.5).toLong) / 10000.0
      assert(r.getDouble(7) == fused, r.mkString(","))
    }
    val order = Retrieval.proximityRank(docs).collect().map(_.getLong(0))
    assert(order.indexOf(60L) < order.indexOf(61L), order.mkString(","))
  }

  test("phraseSearch: exact alignment counts, merge-walk min window, " +
    "and the in-plan top-trigram query") {
    import spark.implicits._
    // make "p q r" the unambiguous top trigram (4 occurrences); doc 40
    // has both query terms far apart and NO phrase
    val docs = Seq(
      (10L, "p q r z p q r"),          // 2 aligned occurrences
      (20L, "p q r a b c"),            // 1 occurrence
      (30L, "z p q r y"),              // 1 occurrence
      (40L, "p z z q z r z z p"),      // all terms, no alignment
      (50L, "q r p"))                  // all terms, wrong order
      .toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(10L, 20L, 30L, 40L, 50L), got.keySet.toString)
    val r10 = got(10L)
    assert((r10.getString(1), r10.getString(2), r10.getString(3))
      == (("p", "q", "r")))
    assert(r10.getLong(7) == 2L && r10.getBoolean(9), r10.mkString(","))
    // doc 10 min window of (p, q): positions p=[1,5], q=[2,6] → 2
    assert(r10.getLong(8) == 2L)
    // doc 40: p=[1,9], q=[4] → closest pair |4-1|=3 → window 4; no phrase
    val r40 = got(40L)
    assert(r40.getLong(7) == 0L && !r40.getBoolean(9), r40.mkString(","))
    assert(r40.getLong(8) == 4L)
    // doc 50 "q r p": q=[1], p=[3] → window 3, phrase impossible
    assert(got(50L).getLong(8) == 3L && got(50L).getLong(7) == 0L)
    // output order: phrase_count desc, then min_window, then doc_id —
    // doc 10 first
    val order = Retrieval.phraseSearch(docs).collect().map(_.getLong(0))
    assert(order.head == 10L, order.mkString(","))
    // layout stability: same result after repartitioning
    val r2 = Retrieval.phraseSearch(docs.repartition(7)).collect()
      .map(_.mkString(",")).toSet
    assert(r2 == got.values.map(_.mkString(",")).toSet)
  }

  test("mrr2: each planted mode defeats exactly the arm it was designed to, fusion never trails") {
    // the hybrid-retrieval justification MEASURED (VERDICT r14 item 6):
    // mode `typo` plants an OOV token inside the leading trigram — the
    // conjunctive proximity arm must find NOTHING while bag-of-words
    // BM25 degrades gracefully; mode `phrase` is a 3-common-token query
    // (the fixture's 31-word vocabulary makes it maximally confusable)
    // where the proximity boost must outrank bag-of-words. RRF fusion
    // must not trail either single arm on query-weighted overall MRR.
    val rows = graft.Queries.all("mrr2_hybrid_eval")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // typo mode: conjunction dead, BM25 alive
    assert(rows(("phrase_prox", "typo"))._2 == 0L,
      s"conjunctive arm found a doc containing the OOV token: $rows")
    assert(rows(("bm25", "typo"))._3 >= 0.5,
      s"bm25 recall collapsed on typo mode: ${rows(("bm25", "typo"))}")
    // phrase mode: proximity beats bag-of-words on MRR
    assert(rows(("phrase_prox", "phrase"))._4 > rows(("bm25", "phrase"))._4,
      s"proximity did not win the confusable 3-token mode: $rows")
    // fusion: query-weighted overall MRR never trails a single arm
    def overall(arm: String): Double = {
      val ms = Seq("phrase", "typo").map(m => rows((arm, m)))
      ms.map(t => t._4 * t._1).sum / ms.map(_._1).sum
    }
    assert(overall("rrf_fused") >= overall("bm25") - 1e-9 &&
      overall("rrf_fused") >= overall("phrase_prox") - 1e-9,
      s"fusion trails a single arm: rrf=${overall("rrf_fused")} bm25=${overall("bm25")} prox=${overall("phrase_prox")}")
  }

  test("ragAssembleContexts: known-item hits rank 1, budget packs greedily in rank order") {
    import spark.implicits._
    val chunks = Seq(
      (1L, 20L, "alpha beta gamma delta one two three four"),
      (2L, 30L, "alpha beta epsilon zeta something else entirely here"),
      (3L, 40L, "unrelated words about other topics and things"))
      .toDF("cid", "n_tokens", "chunk_text")
    val queries = Seq((1L, 1L, "alpha beta gamma delta"))
      .toDF("q_id", "true_cid", "query_text")
    val got = Retrieval.ragAssembleContexts(chunks, queries,
      k = 3, budget = 55).collect()
    assert(got.length == 1)
    val r = got.head
    // chunk 1 contains the query verbatim -> rank 1; all 3 retrieved
    assert(r.getAs[Long]("hit_rank") == 1L)
    assert(r.getAs[Long]("n_retrieved") == 3L)
    // greedy pack: rank1 (20) + rank2 fits iff its size keeps total <= 55;
    // chunk 2 shares "alpha beta" so it outranks chunk 3 -> 20+30=50 in,
    // chunk 3 (40) would push 90 -> out
    assert(r.getAs[Long]("n_in_context") == 2L)
    assert(r.getAs[Long]("context_tokens") == 50L)
    val ctx = r.getAs[String]("context")
    assert(ctx.startsWith("alpha beta gamma delta") && ctx.contains(" | ")
      && !ctx.contains("unrelated"))
  }

  test("ragAssembleContexts: a mid-rank chunk can be skipped, later ones still pack") {
    import spark.implicits._
    // scores are engineered by token overlap: rank1 tiny, rank2 huge
    // (over budget), rank3 small — the window prefix-sum contract says
    // rank2 is skipped AND rank3 is skipped too (cumulative, not
    // knapsack: the running total includes the skipped chunk)
    val chunks = Seq(
      (1L, 10L, "q q q q filler1 filler2"),
      (2L, 60L, "q q q other words here"),
      (3L, 10L, "q distinct tail content"))
      .toDF("cid", "n_tokens", "chunk_text")
    val queries = Seq((9L, 3L, "q q q q")).toDF("q_id", "true_cid", "query_text")
    val r = Retrieval.ragAssembleContexts(chunks, queries,
      k = 3, budget = 40).collect().head
    // cumulative pack: 10 in; 10+60=70 > 40 -> rank2 out; the prefix sum
    // is monotone so rank3 (70+10) is out as well
    assert(r.getAs[Long]("n_in_context") == 1L)
    assert(r.getAs[Long]("context_tokens") == 10L)
  }

  test("ragFaithfulness: exact gram support on crafted contexts") {
    import spark.implicits._
    // q_id 0: 2 planted halluc tokens; context "a b c d" -> answer
    // "a b c d halluc_0_0 halluc_0_1" = 4 grams, exactly 2 grounded
    // ("a b c", "b c d") -> faithfulness 0.5, below the 0.6 gate
    val ctx = Seq((0L, "a b c d")).toDF("q_id", "context")
    val r = Retrieval.ragFaithfulness(ctx).collect().head
    assert(r.getAs[Long]("answer_tokens") == 6L)
    assert(r.getAs[Long]("n_hallucinated") == 2L)
    assert(r.getAs[Long]("n_answer_grams") == 4L)
    assert(r.getAs[Long]("n_grounded") == 2L)
    assert(r.getAs[Double]("faithfulness") == 0.5)
    assert(!r.getAs[Boolean]("faithful"))
    // q_id 1: 3 halluc tokens over a 14-token context -> 12-token core,
    // 15-token answer, 13 grams, the 10 all-core grams grounded
    val toks = (1 to 14).map(i => s"t$i").mkString(" ")
    val r2 = Retrieval.ragFaithfulness(Seq((1L, toks)).toDF("q_id", "context"))
      .collect().head
    assert(r2.getAs[Long]("n_answer_grams") == 13L)
    assert(r2.getAs[Long]("n_grounded") == 10L)
    assert(math.abs(r2.getAs[Double]("faithfulness") - 0.769231) < 1e-9)
    assert(r2.getAs[Boolean]("faithful"))
  }

  test("faith1 on the fixture: planted hallucination keeps scores inside (0,1)") {
    val rows = graft.Queries.all("faith1_rag_grounding")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (g, n) = (r.getAs[Long]("n_grounded"), r.getAs[Long]("n_answer_grams"))
      assert(g >= 0 && g <= n, s"q ${r.getLong(0)}")
      val f = r.getAs[Double]("faithfulness")
      // the planted halluc tail means NO answer is fully grounded; the
      // 12-token copied core means none is fully hallucinated either
      assert(f > 0.0 && f < 1.0, s"q ${r.getLong(0)}: $f")
    }
    // the gate separates on the fixture: most answers pass, some fail
    val passFrac = rows.count(_.getAs[Boolean]("faithful")).toDouble / rows.length
    assert(passFrac > 0.5, s"pass fraction $passFrac")
  }
}
