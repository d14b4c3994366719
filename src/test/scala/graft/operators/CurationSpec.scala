package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // = bench doc 100
      (2L, "a totally different sentence with no overlap at all"),
      (3L, "something quick brown fox jumps over something else entirely"),
      (100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val got = Curation.decontaminate(
      docs.filter($"doc_id" < 100), docs.filter($"doc_id" >= 100), n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_hit_shingles"), r.getAs[Long]("n_bench_docs"))).toMap
    // doc 1 is an exact copy: all 5 of its 5-shingles hit; doc 3 shares
    // exactly one 5-gram ("quick brown fox jumps over"); doc 2 is clean
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == (5L, 1L))
    assert(got(3L) == (1L, 1L))
  }

  test("decontaminateBloom is bit-identical to the exact decontaminate") {
    // the bloom pre-pass may only PRUNE (no false negatives) and the
    // confirm join removes its false positives — same rows, same counts
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    val bench = docs.filter($"doc_id" % 7 === 0)
    assertSameRows(
      Curation.decontaminateBloom(corpus, bench, n = 5),
      Curation.decontaminate(corpus, bench, n = 5))
  }

  test("decontaminateBloom on an empty benchmark finds nothing") {
    val docs = Tables.documents(spark, sf0001)
    val got = Curation.decontaminateBloom(
      docs, docs.filter($"doc_id" < 0), n = 5)
    assert(got.count() == 0L)
  }

  test("keepBest elects the highest-quality cluster member, not the min id") {
    // doc 2 is all stopwords (stop_ratio 1 → quality beats doc 1's 0);
    // cluster {3,4}: doc 3 wins on quality; doc_id tiebreak never fires
    val docs = Seq(
      (1L, "xxxx yyyy zzzz", 14L),
      (2L, "the of and in", 13L),
      (3L, "the the the of", 14L),
      (4L, "qqqq wwww eeee", 14L))
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a_id", "b_id")
    val got = Curation.keepBest(docs, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got == Map(1L -> (2L, 2L), 3L -> (3L, 2L)))
  }

  test("keepBest breaks quality ties on the lower doc id") {
    val docs = Seq(
      (7L, "same text here", 14L),
      (9L, "same text here", 14L))
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((7L, 9L)).toDF("a_id", "b_id")
    val got = Curation.keepBest(docs, pairs).collect()
    assert(got.length == 1 && got.head.getLong(1) == 7L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val cur = Seq((1L, "alpha"), (2L, "beta v2"), (4L, "delta")).toDF("doc_id", "text")
    val got = Curation.snapshotDiff(prev, cur).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("dedupIncremental admits only corpus-unseen, first-in-batch digests") {
    val corpus = Seq((10L, "alpha"), (11L, "beta")).toDF("doc_id", "text")
    val incoming = Seq(
      (20L, "alpha"),  // dup of corpus -> rejected
      (21L, "gamma"), (25L, "gamma"), // in-batch dup -> lowest id wins
      (22L, "delta")).toDF("doc_id", "text")
    val got = Curation.dedupIncremental(incoming, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(21L, 22L))
  }

  test("heavy hitters: exact top-k matches a hand count; ties break token-asc") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a c d")).toDF("doc_id", "text")
    val got = Curation.heavyHittersExact(docs, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L), ("b", 3L), ("c", 2L))) // a before b at 3
  }

  test("Misra-Gries sketch: exact when budget >= vocabulary") {
    val docs = Tables.documents(spark, sf0001)
    val exact = Curation.heavyHittersExact(docs, 1000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = Curation.heavyHittersSketch(docs, budget = 64).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch == exact) // vocab 31 <= 64: no decrement can ever fire
  }

  test("Misra-Gries sketch honors its guarantees in the lossy regime") {
    // crafted skew: one heavy token (40%), long uniform tail, budget 4
    val tail = (0 until 120).map(i => s"t$i")
    val text = (Seq.fill(80)("heavy") ++ tail).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text").repartition(2)
    val n = 200.0
    val budget = 4
    val exact = Curation.heavyHittersExact(docs, 1000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = Curation.heavyHittersSketch(docs, budget).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= budget * 2) // <= budget counters per partition
    // every estimate is a lower bound with error at most N/(budget+1)
    sketch.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overestimated: $est > ${exact(t)}")
      assert(exact(t) - est <= n / (budget + 1), s"$t bound violated")
    }
    // a token heavier than N/(budget+1) must survive
    assert(sketch.contains("heavy"))
    assert(sketch("heavy") >= exact("heavy") - n / (budget + 1))
  }

  test("scd2: consecutive repeats collapse, intervals chain, regimes can recur") {
    // user 1: a(100), a(200) [repeat: collapses], b(300), a(400) [a recurs
    // as a NEW regime]; user 2: one regime. Longs as the time axis keep
    // timestamp formatting out of the algebra under test.
    val changes = Seq(
      (1L, 1L, "a", 100L), (1L, 2L, "a", 200L), (1L, 3L, "b", 300L),
      (1L, 4L, "a", 400L), (2L, 5L, "x", 100L))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Curation.scd2(changes, key = $"user_id", attr = $"event_type",
        ts = $"ts", tiebreak = $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]).getOrElse(-1L), r.getBoolean(4)))
      .sortBy(r => (r._1, r._3)).toSeq
    assert(got == Seq(
      (1L, "a", 100L, 300L, false), (1L, "b", 300L, 400L, false),
      (1L, "a", 400L, -1L, true), (2L, "x", 100L, -1L, true)))
  }

  test("applyChangeFeed: latest op wins, deletes drop keys, reinserts revive") {
    // key 1: U then D            -> gone
    // key 2: U, D, then U again  -> present with the latest value
    // key 3: single U            -> present
    val feed = Seq(
      (1L, 10L, "U", "v1"), (1L, 20L, "D", "x"),
      (2L, 10L, "U", "v2"), (2L, 20L, "D", "x"), (2L, 30L, "U", "v2b"),
      (3L, 10L, "U", "v3"))
      .toDF("key", "seq", "op", "value")
    val got = Curation.applyChangeFeed(feed, Seq("key"), Seq("seq" -> false), "op")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(2L -> "v2b", 3L -> "v3"))
  }

  test("applyChangeFeed: mixed-direction ordering elects asc tiebreak") {
    // same seq for key 1's two ops: epoch ASC tiebreak must pick the
    // EARLIER epoch as winner (first-writer-wins semantics)
    val feed = Seq(
      (1L, 10L, 5L, "U", "early"), (1L, 10L, 9L, "D", "late"),
      (2L, 10L, 1L, "U", "only"))
      .toDF("key", "seq", "epoch", "op", "value")
    val got = Curation.applyChangeFeed(feed, Seq("key"),
      Seq("seq" -> false, "epoch" -> true), "op")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got == Map(1L -> "early", 2L -> "only"))
  }

  test("quantileNormalize: CDF position per stratum; ties share; n=1 is 0") {
    val docs = Seq(
      ("en", "web", 10L), ("en", "web", 20L), ("en", "web", 20L),
      ("en", "web", 40L), ("en", "web", 50L),
      ("fr", "web", 999L), // singleton stratum -> 0
      ("en", "book", 1L), ("en", "book", 2L)) // separate stratum
      .toDF("lang", "source", "n_chars")
    val got = Curation.quantileNormalize(docs, Seq("lang", "source"), "n_chars")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val enWeb = got.filter(t => t._1 == "en" && t._2 == "web")
      .map(t => t._3 -> t._4).toMap
    // ranks over {10,20,20,40,50}: 1,2,2,4,5 -> (r-1)/4
    assert(enWeb == Map(10L -> 0.0, 20L -> 0.25, 40L -> 0.75, 50L -> 1.0))
    assert(got.count(t => t._1 == "en" && t._2 == "web" && t._3 == 20L && t._4 == 0.25) == 2)
    assert(got.find(_._1 == "fr").get._4 == 0.0)
    // stratum isolation: the book docs rank only against each other
    assert(got.find(t => t._2 == "book" && t._3 == 2L).get._4 == 1.0)
  }

  test("psiDrift: reference scores 0, a fully shifted source scores the closed form") {
    // ref 'a': lengths 1..4, median fence 2.5 → two balanced bins;
    // 'b' lives entirely in the upper bin
    val docs = Seq(
      (1L, "x", "en", "a", 1L), (2L, "x", "en", "a", 2L),
      (3L, "x", "en", "a", 3L), (4L, "x", "en", "a", 4L),
      (5L, "x", "en", "b", 3L), (6L, "x", "en", "b", 4L),
      (7L, "x", "en", "b", 3L), (8L, "x", "en", "b", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Curation.psiDrift(docs, refSource = "a", bins = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("a") == ((4L, 0.0)))
    // p=(3/6, 3/6), q=(1/6, 5/6) → (-1/3)ln(1/3) + (1/3)ln(5/3) = 0.5365
    assert(got("b") == ((4L, 0.5365)))
  }

  test("mmdShift: parity split of one population is ~0, a planted shift is not") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sf0001)
    val total = e.count()
    val same = Curation.mmdShift(e, pmod(col("vec_id"), lit(2))).collect()(0)
    assert(same.getLong(0) + same.getLong(1) == total)
    val mmdSame = same.getDouble(2)
    assert(mmdSame >= 0.0)
    // plant a mean shift of +0.5 on every dimension for the odd group
    val shifted = e.withColumn("embedding",
      when(pmod(col("vec_id"), lit(2)) === 1,
        transform(col("embedding"), x => (x + lit(0.5f)).cast("float")))
        .otherwise(col("embedding")))
    val far = Curation.mmdShift(shifted, pmod(col("vec_id"), lit(2)))
      .collect()(0)
    // ||mu_a - mu_b||^2 ~ 64 * 0.25 = 16 >> the parity-split noise
    assert(far.getDouble(2) > 10.0 && far.getDouble(2) > 100 * mmdSame,
      s"planted ${far.getDouble(2)} vs same-pop $mmdSame")
    assert(far.getDouble(3) > 0.4, s"mean_abs_gap ${far.getDouble(3)}")
    intercept[IllegalArgumentException] {
      Curation.mmdShift(e, pmod(col("vec_id"), lit(2)), dim = 0)
    }
  }

  test("doremiWeights: weights form a smoothed distribution aligned with " +
    "excess loss; a planted hard domain wins") {
    val docs = graft.Tables.documents(spark, sf0001)
    val got = Curation.doremiWeights(docs).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    val k = got.length
    assert(k >= 2)
    // weights form a distribution (up to K half-ulps of micro rounding)
    assert(math.abs(got.map(_._3).sum - 1.0) <= k * 1e-6 + 1e-9)
    // uniform smoothing floor: no domain ever starves below ~c/K
    got.foreach { case (s, _, w) =>
      assert(w >= 0.01 / k - 1e-6, s"domain $s starved at $w") }
    // multiplicative weights tilt toward excess loss: max-loss domain at
    // or above uniform, min-loss at or below
    val hi = got.maxBy(_._2); val lo = got.minBy(_._2)
    assert(hi._3 >= 1.0 / k - 1e-6, s"hard domain ${hi._1} below uniform")
    assert(lo._3 <= 1.0 / k + 1e-6, s"easy domain ${lo._1} above uniform")
    // planted: a gibberish (rare-token) domain must take the top weight
    import spark.implicits._
    val easy = (1 to 30).map(i =>
      (i.toLong, "the cat sat on the mat again and again", "common"))
    val hard = (31 to 60).map(i =>
      (i.toLong, s"zqx$i vbnk$i wfjp$i qqzz$i xkcd$i", "rare"))
    val tiny = (easy ++ hard).toDF("doc_id", "text", "source")
    val duel = Curation.doremiWeights(tiny).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(duel("rare")._1 > duel("common")._1) // surprisal ordering sane
    assert(duel("rare")._2 > duel("common")._2,
      s"hard domain must out-weigh: $duel")
  }

  test("epochMaterialize: allocation is honored replica-for-replica, positions dense, layout-proof") {
    val docs = Seq(
      (1L, ("w " * 59).trim + " w", "A"), // 60 tokens -> 2 epochs
      (2L, ("w " * 39).trim + " w", "B")) // 40 tokens -> 2 epochs
      .toDF("doc_id", "text", "source")
    val got = Curation.epochMaterialize(docs)
    val rows = got.collect()
    // 2 docs x 2 epochs = 4 replicas, each (doc, epoch) exactly once
    assert(rows.length == 4)
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSet ==
      Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
    // positions are dense 1..k within each shard
    rows.groupBy(_.getLong(3)).foreach { case (sh, rs) =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == (1L to rs.length).toSeq,
        s"shard $sh positions not dense")
    }
    assertSameRows(got, Curation.epochMaterialize(docs.repartition(5)))
  }

  test("epochMaterialize on the fixture: row count equals epochs x docs per source") {
    val docs = Tables.documents(spark, sf0001)
    val perSource = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val epochs = Curation.epochAllocation(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = perSource.map { case (s, n) => n * epochs(s) }.sum
    assert(Curation.epochMaterialize(docs).count() == want)
  }

  test("preferencePairs: anti-symmetric matching, median unpaired, margin gate, layout-proof") {
    // group g: 5 docs, no stopwords, all tokens "w" (avg len 1), so
    // quality = 0.5*n_tok/100 + 0.02 -> 0.47 0.37 0.27 0.17 0.07.
    // group h: two docs 0.01 apart -> pair filtered by the 0.05 margin
    def doc(id: Long, nTok: Int, src: String) = {
      val t = Seq.fill(nTok)("w").mkString(" ")
      (id, t, "en", src, t.length.toLong)
    }
    val docs = Seq(doc(1, 90, "g"), doc(2, 70, "g"), doc(3, 50, "g"),
      doc(4, 30, "g"), doc(5, 10, "g"), doc(6, 52, "h"), doc(7, 50, "h"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Curation.preferencePairs(docs)
    val rows = got.collect().map(r => (r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(7)))
    // g: best-vs-worst then 2nd-best-vs-2nd-worst; median doc 3 unpaired
    assert(rows.toSet == Set(("g", 1L, 1L, 5L, 0.4), ("g", 2L, 2L, 4L, 0.2)),
      s"got ${rows.toSeq}")
    // h's only pair (margin 0.01) is gated out, and doc 3 appears nowhere
    assert(!rows.exists(_._1 == "h") &&
      !rows.exists(r => r._3 == 3L || r._4 == 3L))
    assertSameRows(got, Curation.preferencePairs(docs.repartition(5)))
  }

  test("preferencePairs on the fixture: each doc used at most once, margins hold") {
    val got = Curation.preferencePairs(Tables.documents(spark, sf0001))
    val n = got.count()
    assert(n > 0)
    val used = got.select($"chosen_id".as("id"))
      .unionAll(got.select($"rejected_id".as("id")))
    assert(used.distinct().count() == 2 * n, "a doc joined two pairs")
    assert(got.filter($"margin" < 0.05 || $"chosen_q" <= $"rejected_q")
      .count() == 0)
  }

  test("epochAllocation: greedy marginal order on crafted sources, layout-proof") {
    // A has 60 tokens, B has 40; budget = 2.2 * 100 = 220.
    // Marginal order: A1(60) B1(40) A2(30) B2(20) A3(15)...
    // spent:          60     100    160    200    260 -> halt
    val docs = Seq(
      (1L, ("w " * 59).trim + " w", "A"), // 60 whitespace tokens
      (2L, ("w " * 39).trim + " w", "B")) // 40
      .toDF("doc_id", "text", "source")
    val got = Curation.epochAllocation(docs)
    val m = got.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(m("A") == ((60L, 2L, 120L, 90.0)), s"A: ${m("A")}")
    assert(m("B") == ((40L, 2L, 80L, 60.0)), s"B: ${m("B")}")
    assert(got.select("budget").head.getLong(0) == 220L)
    assertSameRows(got, Curation.epochAllocation(docs.repartition(5)))
  }

  test("epochAllocation on the fixture: budget respected, epochs contiguous-positive") {
    val got = Curation.epochAllocation(Tables.documents(spark, sf0001))
      .collect()
    val budget = got.head.getLong(5)
    assert(got.map(_.getLong(3)).sum <= budget,
      "allocated tokens must fit the budget")
    // with a 2.2x-unique budget and near-balanced sources, every source
    // trains at least one full epoch and none beyond maxEpochs
    got.foreach { r =>
      val e = r.getLong(2)
      assert(e >= 1 && e <= 6, s"${r.getString(0)} epochs $e out of range")
      assert(r.getLong(3) == e * r.getLong(1))
    }
  }

  test("sftAssemble renders alternating turns and accounts the loss mask") {
    // doc_id 0 -> user turns of 4 tokens, assistant turns of 6 (pair = 10)
    val docs = Seq(
      (0L, "u1 u2 u3 u4 a1 a2 a3 a4 a5 a6 u5 u6 u7 u8 a7 a8 a9 a10 a11 a12 x y z"),
      (1L, "too short")) // 2 tokens < one pair (5 + 7): dropped
      .toDF("doc_id", "text")
    val got = Curation.sftAssemble(docs).collect()
    assert(got.length == 1)
    val r = got.head
    // 23 tokens / 10 per pair = 2 full pairs; the trailing 3 are dropped
    assert(r.getAs[Long]("n_pairs") == 2 && r.getAs[Long]("n_tokens_used") == 20)
    assert(r.getAs[Long]("assistant_tokens") == 12)
    assert(math.abs(r.getAs[Double]("trainable_frac") - 0.6) < 1e-9)
    assert(r.getAs[String]("template") ==
      "<|user|> u1 u2 u3 u4 <|assistant|> a1 a2 a3 a4 a5 a6 " +
      "<|user|> u5 u6 u7 u8 <|assistant|> a7 a8 a9 a10 a11 a12")
  }

  test("sft2: bins respect capacity, and packed/trainable tokens conserve conv1's totals") {
    val docs = Tables.documents(spark, sf0001)
    val conv = Curation.sftAssemble(docs)
    val bins = graft.Queries.all("sft2_mask_pack")(spark, sf0001).collect()
    assert(bins.nonEmpty)
    bins.foreach { b =>
      assert(b.getAs[Long]("bin_tokens") <= 128, s"bin over capacity: $b")
      assert(b.getAs[Long]("trainable_tokens") <= b.getAs[Long]("bin_tokens"))
    }
    // no conversation can hit the 128 cap (docs <= 100 tokens), so the
    // pack is lossless: bin sums must equal conv1's corpus totals
    val totals = conv.agg(sum("n_tokens_used"), sum("assistant_tokens")).head
    assert(bins.map(_.getAs[Long]("bin_tokens")).sum == totals.getLong(0))
    assert(bins.map(_.getAs[Long]("trainable_tokens")).sum == totals.getLong(1))
  }

  test("release3: the SFT card conserves the gated assembly's token totals") {
    val gated = graft.Queries.releaseGateOk(Tables.documents(spark, sf0001))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.expr("text").as("text"))
    val conv = Curation.sftAssemble(gated)
    val card = graft.Queries.all("release3_sft_release")(spark, sf0001).collect()
    assert(card.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 3L),
      "card must cover all 4 shards")
    val totals = conv.agg(sum("n_tokens_used"), sum("assistant_tokens")).head
    assert(card.map(_.getAs[Long]("n_tokens")).sum == totals.getLong(0))
    assert(card.map(_.getAs[Long]("n_trainable")).sum == totals.getLong(1))
    card.foreach { r =>
      assert(r.getAs[Long]("n_trainable") <= r.getAs[Long]("n_tokens"))
      val fill = r.getAs[Double]("mean_fill")
      assert(fill > 0.0 && fill <= 1.0)
    }
  }

  test("urlDedup collapses case/params/fragment/slash variants onto one canonical") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val fetches = Seq(
      (3L, t2, "https://WWW.Example.com/p/1?b=2&a=1&utm_source=x#frag"),
      (1L, ts, "https://www.example.com/p/1/?a=1&fbclid=zz&b=2"),
      (2L, ts, "https://www.example.com/p/1?utm_campaign=y&a=1&b=2"),
      (9L, ts, "https://www.example.com/p/2?a=1"),
      (8L, ts, "https://www.example.com/p/3"))
      .toDF("page_id", "ts", "url")
    val got = Curation.urlDedup(fetches).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set(
      "https://www.example.com/p/1?a=1&b=2",
      "https://www.example.com/p/2?a=1",
      "https://www.example.com/p/3"))
    val g = got("https://www.example.com/p/1?a=1&b=2")
    assert(g.getAs[Long]("n_fetches") == 3 && g.getAs[Long]("n_raw_forms") == 3)
    assert(g.getAs[Long]("kept_page_id") == 1 && g.getAs[java.sql.Timestamp]("first_ts") == ts)
  }

  test("d15: NFC dedup collapses exactly the planted composition twins") {
    val r = graft.Queries.all("d15_nfc_dedup")(spark, sf0001).collect().head
    val docs = Tables.documents(spark, sf0001)
    val planted = docs.filter(col("doc_id") % 10 === 1).count()
    // every planted (decomposed, precomposed) pair collapses under NFC;
    // pairs whose BASE text was already a duplicate collapse transitively,
    // so the extra count is at least the number of distinct planted bases
    val distinctBases = docs.filter(col("doc_id") % 10 === 1)
      .select(md5(col("text"))).distinct().count()
    assert(r.getAs[Long]("extra_collapsed") == distinctBases,
      s"planted $planted twins / $distinctBases distinct bases: $r")
    assert(r.getAs[Long]("nfc_distinct") < r.getAs[Long]("raw_distinct"))
  }

  test("dedupRateEstimate: digest-keyed replicates track a planted dup rate") {
    // 300 distinct texts + 100 extra copies -> exact rate = 100/400 = 0.25;
    // digest-keyed replicates keep copy groups intact, so the replicate
    // mean must land near 0.25 and the exact rate inside 2 sd
    val docs = ((1L to 300L).map(i => (i, s"unique text number $i")) ++
      (301L to 400L).map(i => (i, s"unique text number ${i % 50 + 1}")))
      .toDF("doc_id", "text")
    val r = Curation.dedupRateEstimate(docs).collect().head
    assert(r.getAs[Long]("n_rows") == 400)
    assert(math.abs(r.getAs[Double]("exact_rate") - 0.25) < 1e-6)
    assert(r.getAs[Boolean]("within_2sd"),
      s"exact rate outside the replicate band: $r")
    assert(r.getAs[Double]("rep_sd") > 0.0)
  }

  test("ngramNovelty: exact copy reads 0, fresh text reads 1, partial in between") {
    val train = Seq(
      (1L, "a b c d e f", "s0"),
      (2L, "x y z w", "s0")).toDF("doc_id", "text", "source")
    val gen = Seq(
      (10L, "a b c d e f", "g"),      // exact copy of train 1 -> novelty 0
      (11L, "p q r s t", "g"),        // fresh -> novelty 1
      (12L, "a b c q r s t u", "g"),  // 6 windows, 1 copied ("a b c")
      (13L, "p q", "g"))              // < 3 tokens: no windows, excluded
      .toDF("doc_id", "text", "source")
    val r = Curation.ngramNovelty(train, gen, n = 3).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") == 3, "the 2-token doc must be excluded")
    // windows: doc10 4, doc11 3, doc12 6 = 13; copied: doc10 4, doc12 1
    assert(row.getAs[Long]("n_windows") == 13 && row.getAs[Long]("n_copied") == 5)
    assert(math.abs(row.getAs[Double]("novelty") - (1.0 - 5.0 / 13)) < 1e-5)
    // per-doc mean: (0 + 1 + 5/6) / 3
    assert(math.abs(row.getAs[Double]("mean_doc_novelty") - (0.0 + 1.0 + 5.0 / 6) / 3) < 1e-5)
  }

  test("ngramNovelty counts repeated memorized windows per instance") {
    val train = Seq((1L, "a b c", "s0")).toDF("doc_id", "text", "source")
    // "a b c" appears twice as a window in the gen doc (positions 1 and 4);
    // instance counting must register both, not one distinct shingle
    val gen = Seq((10L, "a b c a b c", "g")).toDF("doc_id", "text", "source")
    val row = Curation.ngramNovelty(train, gen, n = 3).collect().head
    assert(row.getAs[Long]("n_windows") == 4 && row.getAs[Long]("n_copied") == 2)
  }
}
