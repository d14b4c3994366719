package graft.operators

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, text: String, lang: String = "en") =
    (id, text, lang, text.length.toLong)

  private def docsDF(ds: (Long, String, String, Long)*) =
    ds.toSeq.toDF("doc_id", "text", "lang", "n_chars")

  test("bm25: zero score without query terms, saturating boost with them") {
    val d = docsDF(
      doc(1, "spark join vector spark"),       // all three terms, spark ×2
      doc(2, "spark other other other"),       // one term once
      doc(3, "other words only here"))         // no query terms → exactly 0
    val got = TextAnalysis.bm25(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    assert(got(3L) == 0.0)
    assert(got(1L) > got(2L) && got(2L) > 0.0)
    // n_tokens carried for downstream length diagnostics
    val nt = TextAnalysis.bm25(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(nt == Map(1L -> 4L, 2L -> 4L, 3L -> 4L))
  }

  test("featureHash: per-dim counts partition the token mass; same token → same dim") {
    val d = docsDF(
      doc(1, "aa bb aa cc"),
      doc(2, "aa dd"))
    val got = TextAnalysis.featureHash(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // total weight = total tokens, per doc
    assert(got.filter(_._1._1 == 1L).values.sum == 4L)
    assert(got.filter(_._1._1 == 2L).values.sum == 2L)
    // 'aa' hashes identically everywhere: doc 1 holds 2 in that dim,
    // doc 2 holds at least 1 there
    val aaDim = got.collect { case ((1L, dim), 2L) => dim }
    assert(aaDim.nonEmpty, "the duplicated token must land twice in one dim")
    assert(got.contains((2L, aaDim.head)))
    assert(got.values.forall(_ >= 1L))
    assert(got.keys.forall { case (_, dim) => dim >= 0 && dim < 64 })
  }

  test("ndcgAtK: perfect ranking scores 1, an anti-correlated scorer scores below") {
    // gains: doc 1 has all three terms, doc 2 one, doc 3 none — bm25
    // ranks them in exactly that order → ndcg = 1.0
    val aligned = docsDF(
      doc(1, "spark join vector"),
      doc(2, "spark aa bb"),
      doc(3, "cc dd ee"))
    val r = TextAnalysis.ndcgAtK(aligned).collect()(0)
    assert(r.getDouble(2) == 1.0, s"ndcg: ${r.getDouble(2)}")
    assert(r.getDouble(0) == r.getDouble(1)) // dcg == idcg
    // force a gain inversion: 'spark' is rare (1 of 10 docs → high idf),
    // 'join'/'vector' near-universal (9 of 10 → idf ≈ 0.15) — the
    // gain-1 rare-term doc outscores every gain-2 doc, so the bm25 order
    // disagrees with the ideal order and ndcg drops below 1
    val inverted = docsDF(
      (doc(1L, "spark aa bb") +:
        (2L to 10L).map(i => doc(i, "join vector cc"))): _*)
    val r2 = TextAnalysis.ndcgAtK(inverted).collect()(0)
    assert(r2.getDouble(2) < 1.0, s"ndcg: ${r2.getDouble(2)}")
  }

  test("langId: CJK → zh, stopword-rich → en, else und") {
    val d = docsDF(
      doc(1, "the cat sat on the mat with a hat"),
      doc(2, "呼吸 空气 很好", "zh"),
      doc(3, "xyz qrs tuv wxy"))
    val got = TextAnalysis.langId(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(got == Map(1L -> "en", 2L -> "zh", 3L -> "und"))
  }

  test("qualityScore components are exact on a known doc") {
    val text = "the cat sat" // 3 tokens, 11 chars, 1 stopword
    val d = docsDF(doc(1, text))
    val r = TextAnalysis.qualityScore(d).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(math.abs(r.getAs[Double]("avg_token_len") - 3.0) < 1e-9) // (11-2)/3
    assert(math.abs(r.getAs[Double]("stop_ratio") - 0.3333) < 1e-3)
  }

  test("tokenCounts: whitespace vs word-piece counting per source") {
    val d = Seq((1L, "ab cd-ef", "s1"), (2L, "x1 y2", "s1")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.tokenCounts(d).collect()(0)
    assert(r.getAs[Long]("n_docs") == 2)
    assert(r.getAs[Long]("ws_tokens") == 4)   // "ab","cd-ef","x1","y2"
    assert(r.getAs[Long]("word_tokens") == 5) // ab, cd, ef, x1, y2
  }

  test("fingerprint collides on same bag-of-words, differs otherwise") {
    val d = docsDF(doc(1, "b a c"), doc(2, "c b a a"), doc(3, "a b d"))
    val fp = TextAnalysis.fingerprint(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L)) // same distinct-token set {a,b,c}
    assert(fp(1L) != fp(3L))
  }

  test("rollingHash is order-sensitive (unlike fingerprint)") {
    val d = docsDF(doc(1, "a b"), doc(2, "b a"))
    val rh = TextAnalysis.rollingHash(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rh(1L) != rh(2L))
  }

  test("scrub replaces emails, urls and long digit runs with typed tokens") {
    val d = docsDF(
      doc(1, "contact me at alice@example.com or https://example.com/x now"),
      doc(2, "card 12345678 pin 9999 short 123"))
    val got = TextAnalysis.scrub(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[String]("scrubbed") ==
      "contact me at <EMAIL> or <URL> now")
    assert(got(1L).getAs[Long]("n_emails") == 1 && got(1L).getAs[Long]("n_urls") == 1)
    // only runs of 4+ digits are redacted
    assert(got(2L).getAs[String]("scrubbed") == "card <NUM> pin <NUM> short 123")
    assert(got(2L).getAs[Long]("n_long_nums") == 2)
  }

  test("repetition flags duplicated-shingle documents, not varied ones") {
    val d = docsDF(
      doc(1, "spam spam spam spam spam spam spam spam"),
      doc(2, "each word here appears just once overall"))
    val got = TextAnalysis.repetition(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("flagged")) // all 3-shingles identical
    assert(got(1L).getAs[Double]("dup_ratio") > 0.8)
    assert(!got(2L).getAs[Boolean]("flagged"))
    assert(got(2L).getAs[Double]("dup_ratio") == 0.0)
  }

  test("vocabEncode assigns frequency-ranked ids and 0 for OOV") {
    val d = docsDF(
      doc(1, "cat dog cat bird"),
      doc(2, "dog cat zebra"))
    // counts: cat 3, dog 2, bird 1, zebra 1 → vocab(3): cat=1 dog=2 bird=3
    // (bird beats zebra on the token-ascending tie); zebra → OOV 0
    val got = TextAnalysis.vocabEncode(d, 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "1 2 1 3", 2L -> "2 1 0"))
  }

  test("lengthOutliers flags only docs outside the IQR fence") {
    // 12 docs of 10±1 tokens, one 1-token fragment, one 200-token monster:
    // q1≈q3≈10 so the fence is tight and exactly the two extremes flag
    val mid = (1L to 12L).map(i => doc(i, Seq.fill(10)("w").mkString(" ")))
    val d = docsDF(mid ++ Seq(
      doc(90, "w"),
      doc(91, Seq.fill(200)("w").mkString(" "))): _*)
    val got = TextAnalysis.lengthOutliers(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_outlier")).toMap
    assert(got(90L) && got(91L))
    assert((1L to 12L).forall(i => !got(i)))
  }

  test("chunkDocuments: stride-overlapped windows cover every token in order") {
    val d = docsDF(doc(1, (1 to 10).map(i => s"t$i").mkString(" ")))
    val got = TextAnalysis.chunkDocuments(d, window = 4, stride = 3).collect()
      .map(r => (r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_text"))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 4L, "t1 t2 t3 t4"),
      (1L, 4L, "t4 t5 t6 t7"),
      (2L, 4L, "t7 t8 t9 t10"),
      (3L, 1L, "t10")))
    // stitching chunks back with the window−stride=1-token overlap dropped
    // reconstructs the document exactly
    val stitched = (got.head._3 +: got.tail.map(_._3.split(" ").drop(1).mkString(" ")))
      .filter(_.nonEmpty).mkString(" ")
    assert(stitched == (1 to 10).map(i => s"t$i").mkString(" "))
  }

  test("tokenEntropy: uniform text maxes the norm, repetition zeroes it") {
    val d = docsDF(
      doc(1, "a b c d"),       // 4 distinct tokens: H = ln 4, norm = 1
      doc(2, "x x x x"),       // all identical: H = 0
      doc(3, "a a b b"))       // two pairs: H = ln 2
    val got = TextAnalysis.tokenEntropy(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("distinct_tokens"),
          r.getAs[Double]("entropy"), r.getAs[Double]("norm_entropy")))).toMap
    assert(got(1L)._1 == 4L && got(1L)._2 == 4L)
    assert(math.abs(got(1L)._3 - 1.3863) < 1e-9 && got(1L)._4 == 1.0)
    assert(got(2L)._2 == 1L && got(2L)._3 == 0.0 && got(2L)._4 == 0.0)
    assert(math.abs(got(3L)._3 - 0.6931) < 1e-9)
    assert(math.abs(got(3L)._4 - 0.5) < 1e-3)
    // layout-stable on the fixture corpus
    val docs = graft.Tables.documents(spark, sf0001)
    val e1 = TextAnalysis.tokenEntropy(docs)
    val e2 = TextAnalysis.tokenEntropy(docs.repartition(7))
    assert(e1.exceptAll(e2).isEmpty && e2.exceptAll(e1).isEmpty)
    // entropy is bounded by ln(distinct) and nonnegative
    import org.apache.spark.sql.functions.col
    assert(e1.filter(col("entropy") < -1e-9).count() == 0)
    assert(e1.filter(col("norm_entropy") > 1.0 + 1e-9).count() == 0)
  }

  test("tokenPerturb: dropout removes, mask preserves length, both pure") {
    val docs = graft.Tables.documents(spark, sf0001)
    val drop = TextAnalysis.tokenPerturb(docs, "dropout", 0.1).cache()
    // dropped count is consistent with the emitted text
    import org.apache.spark.sql.functions.{col, size, split}
    assert(drop.filter(
      size(split(col("new_text"), " ")) =!= (col("n_tokens") - col("n_affected"))
        && col("n_tokens") =!= col("n_affected")).count() == 0)
    // ~10% of all tokens affected, corpus-wide
    val tot = drop.agg(org.apache.spark.sql.functions.sum("n_tokens"),
      org.apache.spark.sql.functions.sum("n_affected")).head
    val frac = tot.getLong(1).toDouble / tot.getLong(0)
    assert(frac > 0.06 && frac < 0.14, s"dropout fraction $frac")
    // masking keeps length and plants [MASK] exactly n_affected times
    val mask = TextAnalysis.tokenPerturb(docs, "mask", 0.15, salt = "aug2")
    assert(mask.filter(size(split(col("new_text"), " ")) =!= col("n_tokens"))
      .count() == 0)
    val bad = mask.filter(
      size(org.apache.spark.sql.functions.filter(split(col("new_text"), " "),
        t => t === "[MASK]")) =!= col("n_affected")).count()
    assert(bad == 0)
    // pure function of (salt, doc, position): layout-stable
    val drop2 = TextAnalysis.tokenPerturb(docs.repartition(7), "dropout", 0.1)
    assert(drop.exceptAll(drop2).isEmpty && drop2.exceptAll(drop).isEmpty)
    // a different salt redraws the verdicts
    val reSalt = TextAnalysis.tokenPerturb(docs, "dropout", 0.1, salt = "ep2")
    assert(drop.exceptAll(reSalt).count() > 0)
    drop.unpersist()
    intercept[IllegalArgumentException](
      TextAnalysis.tokenPerturb(docs, "shuffle", 0.1))
  }

  test("zipfFit recovers a planted power law") {
    import spark.implicits._
    // counts EXACTLY c_r = round(1000 / r): a planted slope-(-1) law
    val rows = (1 to 20).flatMap { r =>
      val c = math.round(1000.0 / r).toInt
      Seq.fill(c)(s"w$r")
    }
    val docs = Seq((1L, rows.mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(docs, topK = 20).collect().head
    assert(got.getLong(0) == 20)
    assert(math.abs(got.getDouble(1) - (-1.0)) < 0.02, s"slope ${got.getDouble(1)}")
    // intercept_ln ~ ln(1000)
    assert(math.abs(got.getDouble(2) - math.log(1000.0)) < 0.05)
    // degenerate single-term corpus reports zeros, no NaN
    val one = Seq((1L, "a a a")).toDF("doc_id", "text")
    val g1 = TextAnalysis.zipfFit(one, topK = 10).collect().head
    assert(g1.getLong(0) == 1 && g1.getDouble(1) == 0.0)
  }

  test("lid1 confusion: cells partition the corpus, shares sum to 1 per class") {
    import org.apache.spark.sql.functions.{col, sum}
    val docs = graft.Tables.documents(spark, sf0001)
    val m = graft.Queries.all("lid1_confusion")(spark, sf0001)
    assert(m.agg(sum("n")).head.getLong(0) == docs.count())
    val shares = m.groupBy("lang").agg(sum("class_share").as("s"))
      .collect().map(_.getDouble(1))
    assert(shares.forall(s => math.abs(s - 1.0) < 1e-3), shares.mkString(","))
    // predictions stay in the heuristic's codomain; and on THIS fixture
    // (labels are synthetic metadata over English-ish token soup) the
    // matrix honestly shows the domain mismatch: no CJK text exists, so
    // nothing may land in the zh column
    val preds = m.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("zh", "en", "und")))
    assert(m.filter(col("pred_lang") === "zh").count() == 0)
  }

  test("chunkDocuments: a doc shorter than one window is one short chunk") {
    val d = docsDF(doc(1, "a b"), doc(2, "c"))
    val got = TextAnalysis.chunkDocuments(d, window = 64, stride = 48).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("chunk_idx"), r.getAs[Long]("n_tokens"),
          r.getAs[String]("chunk_text")))).toMap
    assert(got == Map(1L -> ((0L, 2L, "a b")), 2L -> ((0L, 1L, "c"))))
  }

  test("bpeTrain: greedy pair merges with exact counts and lexicographic ties") {
    // corpus: aa×3, ab×1, b×1 — merge 1 must be (a,a) weight 3, and after
    // it the only adjacent pair left is (a,b) in 'ab'
    val docs = Seq((1L, "aa aa ab"), (2L, "aa b")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, merges = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, "a", "a", "aa", 3L), (2L, "a", "b", "ab", 1L)))
    // the overlap law: 'aaaa' counts 3 overlapping (a,a) positions, and
    // the greedy left-to-right merge yields [aa, aa] — so merge 2 is
    // (aa, aa), proving replace() consumed pairs exactly like BPE does
    val over = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got2 = TextAnalysis.bpeTrain(over, merges = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got2.toSeq == Seq((1L, "a", "a", "aa", 3L), (2L, "aa", "aa", "aaaa", 1L)))
    // deterministic under layout: repartitioned corpus learns the same table
    val again = TextAnalysis.bpeTrain(docs.repartition(5), merges = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(again.toSeq == got.toSeq)
  }

  test("bpeEncodeStats: pieces follow the learned merges exactly") {
    // same corpus as the training test: merges learned are (a,a)->aa then
    // (a,b)->ab, so 'aa'→[aa]=1 piece, 'ab'→[ab]=1, 'b'→[b]=1
    val docs = Seq((1L, "aa aa ab"), (2L, "aa b")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncodeStats(docs, merges = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 3L, 3L, 1.0), (2L, 2L, 2L, 1.0)))
    // one merge only: (a,a)->aa still fuses 'aa', but 'ab' stays [a, b]
    val one = TextAnalysis.bpeEncodeStats(docs, merges = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(one.toSeq == Seq((1L, 3L, 4L, 1.3333), (2L, 2L, 2L, 1.0)))
  }

  test("corpusBleu: dropout twins give p_1 = 1, monotone p_n, BLEU in (0, 1]") {
    val docs = graft.Tables.documents(spark, sf0001)
    val r = TextAnalysis.corpusBleu(docs).collect()(0)
    def l(c: String) = r.getLong(r.fieldIndex(c))
    def d(c: String) = r.getDouble(r.fieldIndex(c))
    // dropout candidates are subsequences of the reference, so every
    // candidate unigram exists in the reference with at least its
    // multiplicity: p_1 is exactly 1
    assert(l("clipped_1") == l("total_1") && d("p_1") == 1.0)
    // clipped can never exceed total at any n
    (1 to 4).foreach(n => assert(l(s"clipped_$n") <= l(s"total_$n")))
    // higher-order precision can only fall for subsequence candidates
    assert(d("p_1") >= d("p_2") && d("p_2") >= d("p_3") && d("p_3") >= d("p_4"))
    // dropout shortens the candidate stream → BP strictly below 1
    assert(l("cand_tokens") < l("ref_tokens") && d("bp") < 1.0 && d("bp") > 0.0)
    assert(d("bleu") > 0.0 && d("bleu") <= 1.0)
    // BLEU recomputes from its own reported components (1e-6 grid)
    val expect = math.floor(d("bp") * math.exp(
      (1 to 4).map(n => math.log(math.max(d(s"p_$n"), 1e-9))).sum / 4.0)
      * 1e6 + 0.5) / 1e6
    assert(d("bleu") == expect)
  }

  test("corpusBleu: identical candidate and reference scores BLEU = 1") {
    // rate ~ 0: threshold rounds to 0, no token is ever dropped
    val docs = graft.Tables.documents(spark, sf0001)
    val r = TextAnalysis.corpusBleu(docs, rate = 1e-9).collect()(0)
    def d(c: String) = r.getDouble(r.fieldIndex(c))
    (1 to 4).foreach(n => assert(d(s"p_$n") == 1.0))
    assert(d("bp") == 1.0 && d("bleu") == 1.0)
    intercept[IllegalArgumentException] {
      TextAnalysis.corpusBleu(docs, rate = 1.5)
    }
  }

  test("unigramTrain: character coverage, mass conservation, planted-piece recovery") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
    val vocab = TextAnalysis.unigramTrain(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // every character of the corpus is a piece (coverage guarantee)
    val corpusChars = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(explode(split(col("w"), "")).as("ch"))
      .distinct().collect().map(_.getString(0)).toSet
    val pieceSet = vocab.map(_._1).toSet
    assert(corpusChars.subsetOf(pieceSet), (corpusChars -- pieceSet).toString)
    // Viterbi tiles every word exactly: piece mass equals corpus char mass
    // (up to the +1 floor of any unused character)
    val charMass = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    val pieceMass = vocab.map(t => t._2 * t._3).sum
    assert(pieceMass >= charMass && pieceMass <= charMass + corpusChars.size,
      s"$pieceMass vs $charMass")
    // probabilities are a distribution on the 1e-6 grid
    val pSum = vocab.map(_._4).sum
    assert(math.abs(pSum - 1.0) < 1e-3, s"p6 sum $pSum")
    // EM kept at least one multi-character piece with real mass
    assert(vocab.exists(t => t._2 > 1 && t._3 > 100), vocab.mkString(","))
    // a corpus that is ONE repeated word must concentrate mass on its pieces
    import spark.implicits._
    val tiny = (1 to 30).map(i => (i.toLong, "abab abab"))
      .toDF("doc_id", "text")
    val tv = TextAnalysis.unigramTrain(tiny, seedSize = 6, maxPieceLen = 4)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    // the dominant piece covers "abab" whole or as ab+ab
    val top = tv.maxBy(_._2)._1
    assert(top == "abab" || top == "ab", tv.mkString(","))
  }

  test("unigramTrain refuses an empty corpus with a clear message") {
    import spark.implicits._
    val empty = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.unigramTrain(empty, seedSize = 6, maxPieceLen = 4)
    }
    assert(ex.getMessage.contains("no non-empty words"), ex.getMessage)
  }

  test("corpusRouge: subsequence candidates give precision 1, recall = length ratio") {
    val docs = graft.Tables.documents(spark, sf0001)
    val r = TextAnalysis.corpusRouge(docs).collect()(0)
    def l(c: String) = r.getLong(r.fieldIndex(c))
    def d(c: String) = r.getDouble(r.fieldIndex(c))
    // dropout candidates are subsequences → every candidate unigram is
    // clipped-matched: precision_1 = 1 and recall_1 = cand/ref exactly
    assert(d("precision_1") == 1.0)
    val expect = math.floor(l("cand_total_1").toDouble /
      l("ref_total_1").toDouble * 1e6 + 0.5) / 1e6
    assert(d("rouge_1") == expect)
    // recall can only fall with n; F1 sits between precision and recall
    assert(d("rouge_1") >= d("rouge_2"))
    Seq(1, 2).foreach { n =>
      val (p, rr, f) = (d(s"precision_$n"), d(s"rouge_$n"), d(s"f1_$n"))
      assert(f >= math.min(p, rr) - 1e-6 && f <= math.max(p, rr) + 1e-6)
    }
  }

  test("kneserNeyBigrams: hand-computed toy model, per-context mass <= 1 " +
    "with equality on a saturated context") {
    import spark.implicits._
    // bigrams: (a,b)x2, (a,c)x1 → c_a=3, N1+(a,.)=2; N1+(.,b)=N1+(.,c)=1;
    // N1+(..)=2 → Pcont = 1/2 each
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyBigrams(docs, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    // P(b|a) = (2-.75)/3 + .75*2/3*(1/2);  P(c|a) = (1-.75)/3 + .25
    assert(got(("a", "b")) == 0.666667, got.toString)
    assert(got(("a", "c")) == 0.333333, got.toString)
    // context 'a' has seen its entire successor vocabulary → mass is 1
    assert(math.abs(got(("a", "b")) + got(("a", "c")) - 1.0) < 2e-6)
    // fixture corpus: observed-successor mass never exceeds 1 per context
    val fix = TextAnalysis.kneserNeyBigrams(
      graft.Tables.documents(spark, sf0001), minCount = 1).collect()
    val perCtx = fix.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(6)).sum)
    perCtx.foreach { case (a, m) =>
      assert(m <= 1.0 + 1e-4, s"context $a mass $m") }
    // discounting: every probability is positive and below 1
    fix.foreach(r => assert(r.getDouble(6) > 0 && r.getDouble(6) < 1))
  }

  test("corpusChrF: char-unigram precision 1, precision >= recall, " +
    "formula tail replays from the snapped per-n ratios") {
    val docs = graft.Tables.documents(spark, sf0001)
    val r = TextAnalysis.corpusChrF(docs).collect()(0)
    def l(c: String) = r.getLong(r.fieldIndex(c))
    def d(c: String) = r.getDouble(r.fieldIndex(c))
    // whole-token dropout removes contiguous char blocks → candidate char
    // unigrams are a sub-multiset of the reference's
    assert(l("clipped_1") == l("cand_total_1") && d("p_1") == 1.0)
    (1 to 6).foreach { n =>
      assert(l(s"clipped_$n") <= math.min(l(s"cand_total_$n"), l(s"ref_total_$n")))
      assert(d(s"p_$n") >= d(s"r_$n"), s"n=$n") // cand totals are smaller
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val chrP = r6((1 to 6).map(n => d(s"p_$n")).sum / 6.0)
    val chrR = r6((1 to 6).map(n => d(s"r_$n")).sum / 6.0)
    assert(d("chr_p") == chrP && d("chr_r") == chrR)
    val f = if (4.0 * chrP + chrR > 0)
      r6(5.0 * chrP * chrR / (4.0 * chrP + chrR)) else 0.0
    assert(d("chrf") == f && f > 0.0 && f <= 1.0)
  }

  test("corpusChrF tolerates empty documents (no phantom grams)") {
    import spark.implicits._
    val tiny = Seq((1L, "ab cd"), (2L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.corpusChrF(tiny, maxN = 2).collect()(0)
    // doc 2 contributes zero grams; totals reflect doc 1 (minus dropout)
    assert(r.getLong(r.fieldIndex("ref_total_1")) == 4L)
    assert(r.getLong(r.fieldIndex("cand_total_1")) <= 4L)
  }

  test("unigramEncodeStats: every word yields >= 1 piece, totals account for " +
    "all tokens, ratio matches its own counts") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
    val got = TextAnalysis.unigramEncodeStats(docs).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"doc ${r.getLong(0)}")
      val ppw = math.floor(r.getLong(2).toDouble / r.getLong(1).toDouble
        * 1e4 + 0.5) / 1e4
      assert(r.getDouble(3) == ppw)
    }
    val totalWords = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(got.map(_.getLong(1)).sum == totalWords)
    // a single-word corpus segments every occurrence identically
    import spark.implicits._
    val tiny = (1 to 20).map(i => (i.toLong, "abab abab abab"))
      .toDF("doc_id", "text")
    val t = TextAnalysis.unigramEncodeStats(tiny, seedSize = 6)
      .select("n_words", "n_pieces").distinct().collect()
    assert(t.length == 1 && t(0).getLong(0) == 3L)
  }

  test("langTrainConfusion learns a planted vocabulary signal") {
    import spark.implicits._
    // class 'aa' speaks token xx, class 'bb' speaks token yy — fully
    // separable, so the trained heads must produce a diagonal confusion
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "aa", "xx xx xx shared")
      else (i.toLong, "bb", "yy yy yy shared")
    }.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val got = TextAnalysis.langTrainConfusion(docs, Seq("aa", "bb"),
      dims = 8, iters = 8, lr = 4.0)
      .orderBy("lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("aa", "aa", 20L, 1.0), ("bb", "bb", 20L, 1.0)),
      got.toSeq.toString)
  }

  test("langTrainConfusion: fixture shares sum to 1 per class; inputs validated") {
    val docs = graft.Tables.documents(spark, sf0001)
    val classes = Seq("de", "en", "es", "fr", "zh")
    val cells = TextAnalysis.langTrainConfusion(docs, classes).collect()
    val byLang = cells.groupBy(_.getString(0))
    byLang.foreach { case (_, rows) =>
      val share = rows.map(_.getDouble(3)).sum
      assert(math.abs(share - 1.0) < 1e-3, s"shares sum to $share")
    }
    // every predicted label comes from the declared class list
    cells.foreach(r => assert(classes.contains(r.getString(1))))
    intercept[IllegalArgumentException] {
      TextAnalysis.langTrainConfusion(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.langTrainConfusion(docs, Seq("en", "en"))
    }
  }

  // independent md5 bucket replica of Sampling.hashBucket (first 8 hex
  // chars of md5, parsed base 16, mod 10000) — NOT the Spark expression
  private def md5Bucket(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % 10000L
  }

  // classic O(nm) token-level Levenshtein, independent of both engines
  private def lev(a: IndexedSeq[String], b: IndexedSeq[String]): Long = {
    var prev = Array.tabulate(b.length + 1)(_.toLong)
    for (i <- 1 to a.length) {
      val cur = new Array[Long](b.length + 1); cur(0) = i.toLong
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(b.length)
  }

  test("kappaAgreement: perfect rater scores 1, a constant rater scores " +
    "exactly 0 whatever its accuracy, mixed case matches the formula") {
    val en = "the of and to in is it for on with"   // all stopwords
    val xx = "zz yy ww vv uu tt ss rr qq pp"        // none
    val perfect = docsDF(
      doc(1, en, "en"), doc(2, en, "en"), doc(3, xx, "de"), doc(4, xx, "fr"))
    val p = TextAnalysis.kappaAgreement(perfect).collect()(0)
    assert(p.getDouble(7) == 1.0, p.toString)
    // constant rater: says 'en' for every doc; half the labels are en —
    // accuracy 0.5 but kappa must be EXACTLY 0 (all agreement is chance)
    val const = docsDF(
      doc(1, en, "en"), doc(2, en, "de"), doc(3, en, "en"), doc(4, en, "fr"))
    val c = TextAnalysis.kappaAgreement(const).collect()(0)
    assert(c.getDouble(5) == 0.5 && c.getDouble(7) == 0.0, c.toString)
    // mixed 2x2: tp=1 fp=1 fn=1 tn=1 → po=0.5, pe=0.5, kappa=0
    val mixed = docsDF(
      doc(1, en, "en"), doc(2, en, "de"), doc(3, xx, "en"), doc(4, xx, "fr"))
    val m = TextAnalysis.kappaAgreement(mixed).collect()(0)
    assert((m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4)) ==
      ((1L, 1L, 1L, 1L)))
    assert(m.getDouble(7) == 0.0)
    // asymmetric: tp=2 fp=0 fn=1 tn=1 → po=0.75, pe=(2*3+1*2)/16=0.5,
    // kappa = 0.25/0.5 = 0.5
    val asym = docsDF(doc(1, en, "en"), doc(2, en, "en"),
      doc(3, xx, "en"), doc(4, xx, "de"))
    val a = TextAnalysis.kappaAgreement(asym).collect()(0)
    assert(a.getDouble(7) == 0.5, a.toString)
  }

  test("textRank: a hub word outranks its spokes; frequency alone does " +
    "not rank; vocabulary cap and determinism hold") {
    // star graph: 'hub' is adjacent to every spoke; spokes only touch the
    // hub. 'noise' repeats a lot but NEVER adjacent to a vocab word other
    // than itself — drop it from pairs (self-pairs filtered), so its rank
    // is pure teleport while the hub collects every spoke's vote.
    val d = docsDF(
      doc(1, "hub s1 hub s2 hub s3 hub s4"),
      doc(2, "noise noise noise noise noise noise"))
    val r = TextAnalysis.textRank(d, vocab = 6, iters = 5).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.size == 6)
    assert(r("hub") > r("s1") && r("s1") > r("noise"),
      r.toString) // votes, not counts: noise is the most frequent token
    assert(r("s1") == r("s2") && r("s2") == r("s3")) // symmetric spokes
    // determinism under repartitioning, bit-identical
    val r2 = TextAnalysis.textRank(d.repartition(5), vocab = 6, iters = 5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r2 == r)
    // the vocabulary cap binds: only the top-k tokens appear
    val capped = TextAnalysis.textRank(d, vocab = 2).collect()
    assert(capped.length == 2)
    intercept[IllegalArgumentException] {
      TextAnalysis.textRank(d, vocab = 1)
    }
  }

  test("corpusWer: fixture-wide independent replay (md5 corruption + " +
    "token DP) matches the engine's encoded-levenshtein path exactly") {
    val docs = graft.Tables.documents(spark, sf0001)
    val raw = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var refToks = 0L; var candToks = 0L; var edits = 0L
    raw.foreach { case (id, text) =>
      val ref = text.split(" ", -1).toIndexedSeq
      val cand = ref.zipWithIndex.flatMap { case (t, i) =>
        val h = md5Bucket(s"wer:$id:${i + 1}")
        if (h < 500) None
        else if (h < 1500) Some("\u0001")
        else Some(t)
      }
      refToks += ref.length; candToks += cand.length
      edits += lev(cand, ref)
    }
    val r = TextAnalysis.corpusWer(docs).collect()(0)
    def l(c: String) = r.getLong(r.fieldIndex(c))
    assert(l("n_docs") == raw.length)
    assert(l("ref_tokens") == refToks, s"${l("ref_tokens")} vs $refToks")
    assert(l("cand_tokens") == candToks)
    assert(l("edits") == edits, s"${l("edits")} vs $edits")
    val wer = math.floor(edits.toDouble / refToks * 1e6 + 0.5) / 1e6
    assert(r.getDouble(r.fieldIndex("wer")) == wer)
    // edits can undercut applied-op count (alignment may be cheaper) but
    // never exceed it, and never undercut pure length difference
    assert(edits >= refToks - candToks && edits <= refToks)
  }

  test("corpusWer: identical twins cost 0; vocab over the 94-char " +
    "alphabet fails loudly; bad thresholds rejected") {
    val same = docsDF(doc(1, "a b c a"), doc(2, "x y"))
    val r0 = TextAnalysis.corpusWer(same, delThresh = 0, subThresh = 0)
      .collect()(0)
    assert(r0.getLong(r0.fieldIndex("edits")) == 0L &&
      r0.getDouble(r0.fieldIndex("wer")) == 0.0)
    val wide = docsDF(doc(1, (1 to 95).map(i => s"tok$i").mkString(" ")))
    val e = intercept[Exception] {
      TextAnalysis.corpusWer(wide).collect()
    }
    assert(e.getMessage.contains("94-char encode alphabet") ||
      Option(e.getCause).exists(_.getMessage.contains("94-char")),
      e.getMessage)
    intercept[IllegalArgumentException] {
      TextAnalysis.corpusWer(same, delThresh = 600, subThresh = 500)
    }
  }

  test("heapsLaw: open vocab reads a high beta, a closed vocab ~0, layout-proof") {
    import spark.implicits._
    // every doc introduces ONLY new tokens: V(T) = T exactly -> beta = 1
    val open = (1 to 16).map(i =>
      (i.toLong, (1 to 4).map(t => s"w${i}_$t").mkString(" ")))
      .toDF("doc_id", "text")
    val go = TextAnalysis.heapsLaw(open)
    val betaOpen = go.head.getDouble(3)
    assert(math.abs(betaOpen - 1.0) < 1e-6, s"open-vocab beta $betaOpen")
    // V(ck) = n_tokens(ck) on every checkpoint row
    go.collect().foreach(r => assert(r.getLong(1) == r.getLong(2)))
    // one token repeated everywhere: V saturates at 1 -> beta = 0
    val closed = (1 to 16).map(i => (i.toLong, "w w w w"))
      .toDF("doc_id", "text")
    val betaClosed = TextAnalysis.heapsLaw(closed).head.getDouble(3)
    assert(betaClosed == 0.0, s"closed-vocab beta $betaClosed")
    assertSameRows(go, TextAnalysis.heapsLaw(open.repartition(5)))
    // checkpoints are the powers of two <= n, vocab monotone along them
    val cks = go.collect().sortBy(_.getLong(0))
    assert(cks.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    assert(cks.map(_.getLong(2)).toSeq == cks.map(_.getLong(2)).sorted.toSeq)
  }

  test("oovRateBySource: top-K cut, boundary tie to token asc, layout-proof") {
    import spark.implicits._
    // counts: a=5 b=3 c=1 d=1. K=2 vocab {a,b}: X misses c, Y misses d.
    // K=3 takes c over d (count tie -> token asc): X fully covered.
    val docs = Seq(
      (1L, "a a a c", "X"), (2L, "a a b b b d", "Y"))
      .toDF("doc_id", "text", "source")
    val k2 = TextAnalysis.oovRateBySource(docs, vocabK = 2).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(k2("X") == ((4L, 1L, 1L, 0.25)), s"X: ${k2("X")}")
    assert(k2("Y") == ((6L, 1L, 1L, 0.1667)), s"Y: ${k2("Y")}")
    val k3 = TextAnalysis.oovRateBySource(docs, vocabK = 3).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(k3 == Map("X" -> 0L, "Y" -> 1L), s"k3: $k3")
    assertSameRows(TextAnalysis.oovRateBySource(docs, vocabK = 2),
      TextAnalysis.oovRateBySource(docs.repartition(5), vocabK = 2))
  }

  test("bpeFertilityByLang: per-lang rollup is exactly bpe2's encode re-grouped") {
    val docs = graft.Tables.documents(spark, sf0001)
    val got = TextAnalysis.bpeFertilityByLang(docs, merges = 6).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // recompute from the per-doc encode: same docs, same word/piece mass
    val perDoc = TextAnalysis.bpeEncodeStats(docs, merges = 6)
      .join(docs.select($"doc_id", $"lang"), "doc_id").collect()
      .groupBy(_.getString(4))
    assert(got.keySet == perDoc.keySet)
    perDoc.foreach { case (lang, rows) =>
      val (nd, nw, np, f) = got(lang)
      assert(nd == rows.length)
      assert(nw == rows.map(_.getLong(1)).sum)
      assert(np == rows.map(_.getLong(2)).sum)
      // fertility >= 1: a word is never fewer than one piece
      assert(f >= 1.0, s"$lang fertility $f < 1")
    }
  }

  test("perplexityBuckets: fluency ordering drives the tertile cut, layout-proof") {
    // token frequencies: t is common (8 occurrences), q/r/s are singletons
    // -> d1 (all t) is most fluent, d4 (all rare) least; n=4 per lang cuts
    // rank-exact at sizes 2/1/1
    val docs = Seq(
      (1L, "t t t t", "en"), (2L, "t t t u", "en"),
      (3L, "t u u v", "en"), (4L, "q r s v", "en"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.perplexityBuckets(docs)
    val by = got.collect()
      .map(r => r.getLong(0) -> (r.getInt(4), r.getString(5))).toMap
    assert(by == Map(1L -> ((1, "head")), 2L -> ((1, "head")),
      3L -> ((2, "middle")), 4L -> ((3, "tail"))), s"got $by")
    assertSameRows(got, TextAnalysis.perplexityBuckets(docs.repartition(5)))
  }

  test("perplexityBuckets on the fixture: balanced per-lang tertiles, monotone surprisal") {
    val got = TextAnalysis.perplexityBuckets(
      graft.Tables.documents(spark, sf0001)).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      // rank-exact tertiles: bucket sizes differ by at most 1
      val sizes = rows.groupBy(_.getInt(4)).view.mapValues(_.length).toMap
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$lang unbalanced: $sizes")
      // the partition respects the score: every head doc is at most as
      // surprising as every tail doc
      val head = rows.filter(_.getString(5) == "head").map(_.getDouble(3))
      val tail = rows.filter(_.getString(5) == "tail").map(_.getDouble(3))
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.max <= tail.min, s"$lang head/tail inverted")
    }
  }

  test("qf1: the distilled quality head recovers the gate on held-out docs") {
    // the FineWeb-Edu shape: the rule gate labels, a cheap linear head
    // learns it. Feature standardization is load-bearing (raw-scale GD
    // measured AUC 0.49 at 10 steps; standardized 0.91+ — the gate's
    // thresholds live on tiny-variance features like the 0.05-0.10
    // stopword-ratio band); dup_ratio is deliberately absent from the
    // features, so the pins are "clearly better than chance and the
    // majority class", not perfection.
    val r = graft.Queries.all("qf1_quality_distill")(spark, sf0001).head
    val (nTrain, nEval, nPos) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (auc, acc) = (r.getDouble(3), r.getDouble(4))
    assert(nTrain + nEval == 500 && nEval > 0, s"fold split broke: $r")
    val majority = math.max(nPos, nEval - nPos).toDouble / nEval
    assert(auc >= 0.85, s"held-out AUC $auc below 0.85")
    assert(acc > majority, s"accuracy $acc does not beat majority $majority")
  }

  test("labelNoise: off-diagonal confident docs are flagged, per class") {
    // class means: t1 = (0.9+0.8+0.2)/3 = 0.633333, t0 = (0.9+0.7+0.3)/3
    // = 0.633333; the 0.2-scored positive and 0.7-scored negative sit
    // confidently in the OTHER class -> one label issue each side
    val scored = Seq(
      (1L, 1.0, 0.9), (2L, 1.0, 0.8), (3L, 1.0, 0.2),
      (4L, 0.0, 0.1), (5L, 0.0, 0.3), (6L, 0.0, 0.7))
      .toDF("doc_id", "y", "s6")
    val got = TextAnalysis.labelNoise(scored).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (lbl <- Seq(0L, 1L)) {
      val r = got(lbl)
      assert(r.getAs[Long]("n_docs") == 3)
      assert(r.getAs[Long]("n_confident_same") == 2, s"label $lbl")
      assert(r.getAs[Long]("n_label_issues") == 1, s"label $lbl")
      assert(r.getAs[Long]("n_unassigned") == 0, s"label $lbl")
      assert(math.abs(r.getAs[Double]("class_threshold") - 0.633333) < 1e-9)
    }
  }

  test("distinctNgrams: repetition collapses the ratio, diversity maxes it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a a a", "rep"),          // 1-grams: 6 inst / 1 distinct
      (2L, "w x y z q r", "div"))          // 6 inst / 6 distinct
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.distinctNgrams(docs, maxN = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(got.size == 4)
    val rep1 = got(("rep", 1L))
    assert(rep1.getAs[Long]("n_grams") == 6 && rep1.getAs[Long]("n_distinct") == 1)
    val div2 = got(("div", 2L))
    assert(div2.getAs[Long]("n_grams") == 5 && div2.getAs[Long]("n_distinct") == 5)
    assert(math.abs(div2.getAs[Double]("distinct_ratio") - 1.0) < 1e-9)
    assert(got(("rep", 2L)).getAs[Long]("n_distinct") == 1)
  }

  test("cl1 on the fixture: issues exist but are the minority in both classes") {
    val rows = graft.Queries.all("cl1_label_noise")(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))
    rows.foreach { r =>
      val (n, issues) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_label_issues"))
      assert(n > 0 && issues < n / 2,
        s"label ${r.getLong(0)}: $issues issues of $n docs — CL should flag a minority")
    }
  }

  test("wm1 on the fixture: detection equals ground truth, natural text reads ~gamma") {
    val rows = graft.Queries.all("wm1_watermark_detect")(spark, sf0001).collect()
    assert(rows.length == 500)
    // no false positives: every detected doc is a planted one
    rows.filter(_.getAs[Boolean]("detected"))
      .foreach(r => assert(r.getAs[Boolean]("planted"),
        s"natural doc ${r.getLong(0)} flagged: z=${r.getAs[Double]("z_score")}"))
    // full recall on detectable plants (enough tokens to test)
    val plantedBig = rows.filter(r =>
      r.getAs[Boolean]("planted") && r.getAs[Long]("n_tokens") >= 8)
    assert(plantedBig.nonEmpty)
    plantedBig.foreach { r =>
      assert(r.getAs[Boolean]("detected"), s"planted doc ${r.getLong(0)} missed")
      // a green-only sampler's output is 100% green
      assert(r.getAs[Double]("green_ratio") == 1.0, s"doc ${r.getLong(0)}")
    }
    // natural text reads FAR below the planted 1.0 (the fixture's ~31-token
    // vocabulary realizes ~10% green token MASS under the 25% hash split —
    // a finite-vocab draw; the z-test's H0 band still cleanly separates)
    val natural = rows.filter(!_.getAs[Boolean]("planted"))
    val meanRatio = natural.map(_.getAs[Double]("green_ratio")).sum / natural.length
    assert(meanRatio > 0.01 && meanRatio < 0.4, s"natural mean green $meanRatio")
    // z sign tracks the ratio against gamma on every row
    rows.filter(_.getAs[Long]("n_tokens") >= 2).foreach { r =>
      val (ratio, z) = (r.getAs[Double]("green_ratio"), r.getAs[Double]("z_score"))
      if (ratio > 0.2500005) assert(z > 0.0, s"doc ${r.getLong(0)}")
      if (ratio < 0.2499995) assert(z < 0.0, s"doc ${r.getLong(0)}")
    }
  }

  test("bestOfN: winner, exact micro-grid mean and uplift on a crafted pool") {
    // one group: best = highest s6 with ties to the smallest doc_id;
    // mean = floor((400000+900000+900000)/3 + 0.5)/1e6 = 0.733333
    val scored = Seq((1L, 0.4), (2L, 0.9), (3L, 0.9)).toDF("doc_id", "s6")
    val r = TextAnalysis.bestOfN(scored, nGroups = 1).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_candidates") == 3)
    assert(r.head.getAs[Long]("best_doc_id") == 2L)
    assert(r.head.getAs[Double]("best_score") == 0.9)
    assert(math.abs(r.head.getAs[Double]("mean_score") - 0.733333) < 1e-9)
    assert(math.abs(r.head.getAs[Double]("uplift") - 0.166667) < 1e-9)
  }

  test("bon1 on the fixture: best-of-n never loses to random selection") {
    val rows = graft.Queries.all("bon1_best_of_n")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("best_score") >= r.getAs[Double]("mean_score"),
        s"group ${r.getLong(0)}")
      assert(r.getAs[Double]("uplift") >= 0.0, s"group ${r.getLong(0)}")
      assert(r.getAs[Long]("n_candidates") >= 1)
    }
    // selection pressure is real on the fixture: some group's winner
    // beats its pool mean by a visible margin
    assert(rows.exists(_.getAs[Double]("uplift") > 0.05))
  }

  test("selfConsistency: modal answers, majority vote and tie rules, crafted") {
    // answers: doc1 "a a b" -> a (count); doc2 "c a" -> a (tie, lexicographic);
    // doc3 "b b c" -> b. Majority: a with 2 of 3 votes.
    val d = docsDF(doc(1, "a a b"), doc(2, "c a"), doc(3, "b b c"))
    val r = TextAnalysis.selfConsistency(d, nPrompts = 1).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_samples") == 3)
    assert(r.head.getAs[Long]("n_distinct_answers") == 2)
    assert(r.head.getAs[String]("majority_answer") == "a")
    assert(r.head.getAs[Long]("n_agree") == 2)
    assert(math.abs(r.head.getAs[Double]("agreement_ratio") - 0.666667) < 1e-9)
  }

  test("cons1 on the fixture: votes partition the corpus, ratios in (0,1]") {
    val rows = graft.Queries.all("cons1_self_consistency")(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_samples")).sum == 500L)
    rows.foreach { r =>
      val (n, agree) = (r.getAs[Long]("n_samples"), r.getAs[Long]("n_agree"))
      assert(agree >= 1 && agree <= n)
      val ratio = r.getAs[Double]("agreement_ratio")
      assert(ratio > 0.0 && ratio <= 1.0)
      if (r.getAs[Long]("n_distinct_answers") == 1)
        assert(agree == n, s"prompt ${r.getLong(0)}: unanimous must keep all")
    }
  }

  test("codeSwitch: window langs, switches and dominant share, crafted") {
    import spark.implicits._
    val en = Seq.fill(4)("the of and to in is on for with by").mkString(" ")
    val un = Seq.fill(40)("xx").mkString(" ")
    // doc1: en|und -> 1 switch, share 0.5; doc2: single und window
    val docs = Seq(("s", s"$en $un"), ("s", "aa bb")).toDF("source", "text")
    val r = TextAnalysis.codeSwitch(docs).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_docs") == 2)
    assert(r.head.getAs[Long]("n_multi_window") == 1)
    assert(r.head.getAs[Long]("n_switched") == 1)
    assert(r.head.getAs[Long]("sum_switches") == 1)
    // shares 0.5 and 1.0 -> micro mean 0.75
    assert(r.head.getAs[Double]("mean_dominant_share") == 0.75)
  }

  test("cs1 plants: en|zh|en switches twice, zh alone never") {
    val rows = graft.Queries.all("cs1_code_switch")(spark, sf0001).collect()
    val p = rows.find(_.getAs[String]("source") == "planted_switch").get
    assert(p.getAs[Long]("n_docs") == 3)
    assert(p.getAs[Long]("n_multi_window") == 2)
    assert(p.getAs[Long]("n_switched") == 1)
    assert(p.getAs[Long]("sum_switches") == 2)
    assert(p.getAs[Double]("mean_dominant_share") == 0.8889)
    // fixture arm: shares are valid probabilities, switch counts bounded
    val fx = rows.filter(_.getAs[String]("source") != "planted_switch")
    assert(fx.map(_.getAs[Long]("n_docs")).sum == 500L)
    fx.foreach { r =>
      assert(r.getAs[Long]("n_switched") <= r.getAs[Long]("n_multi_window"))
      val s = r.getAs[Double]("mean_dominant_share")
      assert(s > 0.0 && s <= 1.0)
    }
  }

  test("canaryExposure: inserted canary ranks first, margin is exact") {
    import spark.implicits._
    // train "a a a" + candidates: control "z" (unseen, -ln(1/4) =
    // 1.3863), true "a" (count 3 -> -ln(4/4) = 0); nCands = 2
    val train = Seq(("a a a")).toDF("text")
    val cands = Seq((1, 0, false, "z"), (1, 1, true, "a"))
      .toDF("k", "cand_id", "is_true", "text")
    val r = TextAnalysis.canaryExposure(train, cands, 2).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("true_score") == 0.0)
    assert(r.head.getAs[Double]("min_control") == 1.3863)
    assert(r.head.getAs[Long]("rank") == 1L)
    assert(r.head.getAs[Double]("exposure") == 1.0)
    assert(r.head.getAs[Double]("margin") == 1.3863)
    assert(r.head.getAs[Boolean]("detected"))
  }

  test("canary1: threshold exposure + the ln(k+1) margin curve") {
    val rows = graft.Queries.all("canary1_exposure")(spark, sf0001).collect()
      .map(r => r.getAs[Int]("k") -> r).toMap
    assert(rows.keySet == Set(0, 1, 4, 16))
    // k = 0: the negative control — tied family, largest-id tie-break
    assert(rows(0).getAs[Long]("rank") == 16L)
    assert(rows(0).getAs[Double]("exposure") == 0.0)
    assert(rows(0).getAs[Double]("margin") == 0.0)
    assert(!rows(0).getAs[Boolean]("detected"))
    // any insertion fully exposes under an n-gram model (why exact
    // dedup removes copies); the k-dependence lives in the margin
    Seq(1, 4, 16).foreach { k =>
      assert(rows(k).getAs[Long]("rank") == 1L, s"k=$k")
      assert(rows(k).getAs[Double]("exposure") == 4.0, s"k=$k")
      assert(rows(k).getAs[Boolean]("detected"), s"k=$k")
    }
    assert(rows(16).getAs[Double]("margin") > rows(4).getAs[Double]("margin"))
    assert(rows(4).getAs[Double]("margin") > rows(1).getAs[Double]("margin"))
  }

  test("spellNoise: deletion-neighborhood finds exactly the d1 pairs") {
    import spark.implicits._
    // aa x10 (frequent), ab x1 (substitution, d=1), xy x1 (d=2, decoy)
    val docs = Seq(("s", (Seq.fill(10)("aa") ++ Seq("ab", "xy")).mkString(" ")))
      .toDF("source", "text")
    val r = TextAnalysis.spellNoise(docs).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("token") == "ab")
    assert(r.head.getAs[Long]("token_count") == 1)
    assert(r.head.getAs[String]("correction") == "aa")
    assert(r.head.getAs[Long]("correction_count") == 10)
  }

  test("typo1 plants resolve to their corrections; the decoy stays out") {
    val rows = graft.Queries.all("typo1_spell_noise")(spark, sf0001).collect()
    val m = rows.map(r =>
      r.getAs[String]("token") -> r.getAs[String]("correction")).toMap
    assert(m == Map("tble" -> "table", "tablee" -> "table",
      "tarle" -> "table", "qery" -> "query", "winow" -> "window"), m.toString)
    rows.foreach { r =>
      assert(r.getAs[Long]("correction_count") >=
        10 * r.getAs[Long]("token_count"), s"ratio gate: $r")
    }
  }

  test("minKMembership: exact top-k surprisal split, crafted") {
    import spark.implicits._
    // train "a a a b": P(a)=(3+1)/6, P(b)=(1+1)/6, unseen=(0+1)/6
    val train = Seq((0L, "a a a b")).toDF("doc_id", "text")
    val probe = Seq((1L, true, "a b"), (2L, false, "z z"))
      .toDF("doc_id", "is_member", "text")
    val r = TextAnalysis.minKMembership(train, probe).collect()
      .map(x => x.getAs[Boolean]("is_member") -> x).toMap
    // member "a b": k = ceil(0.4) = 1 -> top token b = ln(3) = 1.0986;
    // full mean (ln(1.5) + ln(3)) / 2 = 0.752
    assert(r(true).getAs[Long]("n_docs") == 1)
    assert(r(true).getAs[Double]("mean_mink") == 1.0986)
    assert(r(true).getAs[Double]("mean_surprisal") == 0.752)
    // non-member "z z": the unseen ceiling -ln(1/6) everywhere
    assert(r(false).getAs[Double]("mean_mink") == 1.7918)
    assert(r(false).getAs[Double]("mean_surprisal") == 1.7918)
  }

  test("mink1 on the fixture: the top-k tail separates membership") {
    val rows = graft.Queries.all("mink1_membership")(spark, sf0001).collect()
    assert(rows.length == 2)
    val m = rows.find(_.getAs[Boolean]("is_member")).get
    val n = rows.find(!_.getAs[Boolean]("is_member")).get
    assert(m.getAs[Long]("n_docs") + n.getAs[Long]("n_docs") == 500L)
    assert(m.getAs[Double]("mean_mink") < n.getAs[Double]("mean_mink"))
    assert(m.getAs[Double]("mean_surprisal") < n.getAs[Double]("mean_surprisal"))
    // the paper's point: the top-k gap is wider than the full-mean gap
    assert(n.getAs[Double]("mean_mink") - m.getAs[Double]("mean_mink") >
      n.getAs[Double]("mean_surprisal") - m.getAs[Double]("mean_surprisal"),
      s"min-k must sharpen separation: member=$m nonmember=$n")
  }

  test("readability: exact FK grade and ease on a crafted doc") {
    import spark.implicits._
    // "aa bb": 2 words, 2 syllables (one vowel run each), 1 sentence
    // (no punctuation -> clamped to 1):
    //   grade = 0.39*2 + 11.8*1 - 15.59 = -3.01 -> bucket 0
    //   ease  = 206.835 - 1.015*2 - 84.6 = 120.205
    val docs = Seq(("web", "aa bb")).toDF("source", "text")
    val r = TextAnalysis.readability(docs).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("grade_bucket") == 0L)
    assert(r.head.getAs[Long]("n_docs") == 1L)
    assert(r.head.getAs[Double]("mean_grade") == -3.01)
    assert(r.head.getAs[Double]("mean_ease") == 120.205)
  }

  test("fk1 planted sentences land in their hand-computed grade buckets") {
    // doc1: 13 words / 3 sentences / 14 syllables -> grade -1.1923 -> 0
    // doc2:  6 words / 2 sentences /  9 syllables -> grade  3.28   -> 3
    // doc3:  7 words / 1 sentence  / 33 syllables -> grade 42.7686 -> 18
    val rows = graft.Queries.all("fk1_readability")(spark, sf0001).collect()
      .filter(_.getAs[String]("source") == "planted_punct")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 3L)
    assert(rows.map(_.getAs[Long]("grade_bucket")).toSet == Set(0L, 3L, 18L))
    val b3 = rows.find(_.getAs[Long]("grade_bucket") == 3L).get
    assert(b3.getAs[Double]("mean_grade") == 3.28)
  }

  test("fk1 fixture docs read as one long sentence: buckets are sane") {
    val rows = graft.Queries.all("fk1_readability")(spark, sf0001).collect()
      .filter(_.getAs[String]("source") != "planted_punct")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
    rows.foreach { r =>
      val b = r.getAs[Long]("grade_bucket")
      assert(b >= 0L && b <= 18L)
      assert(r.getAs[Double]("mean_ease") <= 206.835)
    }
  }
}
