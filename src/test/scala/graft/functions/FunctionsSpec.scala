package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine_similarity matches a hand-computed value and handles zero-norm") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f), 1.0 / math.sqrt(2)),
      (Array(0.0f, 0.0f), Array(1.0f, 0.0f), 0.0)) // zero-norm → 0, not NaN
      .toDF("a", "b", "expected")
    val got = df.select(cosine_similarity($"a", $"b").as("c"), $"expected").collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("cosine_similarity stays inside whole-stage codegen") {
    // must be file-backed: a local relation gets constant-folded away
    val e = graft.Tables.embeddings(spark, sf0001)
    val df = e.select(cosine_similarity($"embedding", $"embedding").as("c"))
    df.collect() // finalize the AQE plan before inspecting it
    // codegen'd operators print as "*(n) Op" in the compact plan string
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
  }

  test("interpreted and codegen paths agree on fixture embeddings") {
    val e = graft.Tables.embeddings(spark, sf0001).limit(50).cache()
    val a = e.select($"vec_id", $"embedding")
    val pairs = a.crossJoin(a.select($"vec_id".as("v2"), $"embedding".as("e2")))
      .where($"vec_id" < $"v2").limit(100)
    val viaExpr = pairs.select(cosine_similarity($"embedding", $"e2").as("c")).collect().map(_.getDouble(0))
    val viaSql = pairs.selectExpr(
      """aggregate(zip_with(embedding, e2, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, x) -> a + x)
         / (sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (a, x) -> a + x))
            * sqrt(aggregate(transform(e2, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (a, x) -> a + x))) AS c"""
    ).collect().map(_.getDouble(0))
    viaExpr.zip(viaSql).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }

  test("hyperplane_signature matches an independent reimplementation") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val planes = 6; val dim = 64; val table = 3
    // reference reimplementation, straight from the documented weight
    // contract: w(p,d) = pmod(xxhash64(table*planes+p, then d), 10000)/1e4-0.5
    def expectedSig(v: Array[Float]): Int = {
      var sig = 0
      for (p <- 0 until planes) {
        val hp = XXH64.hashInt(table * planes + p, 42L)
        var dot = 0.0
        for (d <- 0 until math.min(dim, v.length)) {
          val h = XXH64.hashInt(d, hp)
          dot += v(d).toDouble * (((h % 10000L + 10000L) % 10000L).toDouble / 10000.0 - 0.5)
        }
        if (dot > 0) sig |= (1 << p)
      }
      sig
    }
    val e = graft.Tables.embeddings(spark, sf0001).limit(50)
    val got = e.select($"vec_id", hyperplane_signature($"embedding", planes, dim, table).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val raw = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> expectedSig(r.getSeq[Float](1).toArray)).toMap
    assert(got == raw)
  }

  test("hyperplane_signature stays inside whole-stage codegen") {
    val e = graft.Tables.embeddings(spark, sf0001)
    val df = e.select(hyperplane_signature($"embedding", 6, 64).as("sig"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
  }

  test("shingle_hashes is bit-identical to the split/window/xxhash pipeline") {
    val docs = graft.Tables.documents(spark, sf0001).limit(100)
    val viaKernel = docs.select($"doc_id",
      explode(shingle_hashes($"text", 3)).as("h"))
    val viaWindow = graft.operators.Dedup
      .shingleStream(docs, 3, distinctPerDoc = false)
      .select($"doc_id", xxhash64($"sg").as("h"))
    assertSameRows(viaKernel, viaWindow)
    // short docs yield no shingles on both paths
    import spark.implicits._
    val short = Seq((1L, "a b"), (2L, ""), (3L, "x y z")).toDF("doc_id", "text")
    assert(short.select(explode(shingle_hashes($"text", 3))).count() == 1)
  }

  test("tokens_in_set counts multiset vocabulary hits; agree count is positional") {
    val df = Seq((Seq("the", "cat", "the", "dog"), Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)))
      .toDF("toks", "a", "b")
    val r = df.select(
      tokens_in_set($"toks", Seq("the", "a")).as("hits"),
      array_agree_count($"a", $"b").as("agree")).collect()(0)
    assert(r.getInt(0) == 2) // 'the' counted twice, multiset semantics
    assert(r.getInt(1) == 2) // positions 0 and 2 agree
    // HOF twin agreement on fixture text
    val docs = graft.Tables.documents(spark, sf0001).limit(100)
    val both = docs.select(
      tokens_in_set(split($"text", " "), Seq("the", "of", "and")).as("fast"),
      size(filter(split($"text", " "),
        t => array_contains(array(lit("the"), lit("of"), lit("and")), t))).as("hof"))
    assert(both.filter($"fast" =!= $"hof").count() == 0)
  }

  test("l2_normalize yields unit vectors; quantize_int8 round-trips closely") {
    val e = graft.Tables.embeddings(spark, sf0001).limit(50)
    val normed = e.select(l2_normalize($"embedding", 8).as("u")).collect()
    normed.foreach { r =>
      val v = r.getSeq[Double](0)
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"norm=$n")
    }
    // zero vector → zeros, not NaN
    val z = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("embedding")
    assert(z.select(l2_normalize($"embedding")).collect()(0)
      .getSeq[Double](0).forall(_ == 0.0))
    // int8 dequantization stays within half a quantization step per element
    val rows = e.select($"embedding", quantize_int8($"embedding").as("q")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).map(_.toDouble)
      val q = r.getSeq[Int](1)
      assert(q.forall(x => x >= -127 && x <= 127))
      val scale = v.map(math.abs).max / 127.0
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x - qi * scale) <= scale / 2 + 1e-12)
      }
    }
  }

  test("jsCoalesce treats empty string as missing (JS || semantics)") {
    val df = Seq(("", "fb"), ("v", "fb"), (null.asInstanceOf[String], "fb")).toDF("a", "b")
    val got = df.select(jsCoalesce($"a", $"b").as("c")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("fb", "v", "fb"))
  }

  test("decSum is invariant to partitioning (order-independent money sums)") {
    val li = graft.Tables.lineitem(spark, sf0001).select($"l_extendedprice")
    val s1 = li.repartition(1).agg(decSum($"l_extendedprice")).collect()(0).getDouble(0)
    val s8 = li.repartition(8).agg(decSum($"l_extendedprice")).collect()(0).getDouble(0)
    assert(s1 == s8) // bit-identical, not approximately equal
  }

  test("ngram_clipped_overlap matches hand counts, incl. the clipping case") {
    def arr(s: String) = s.split(" ")
    val df = Seq(
      // identical → every n-gram matches
      (arr("a b c d"), arr("a b c d"), 1, 4L),
      (arr("a b c d"), arr("a b c d"), 2, 3L),
      // candidate repeats "the" 4×, reference has it twice → clipped at 2
      (arr("the the the the"), arr("the cat the"), 1, 2L),
      // bigram overlap across a repeat: cand [a a a] has (a,a)×2, ref [a a] has it once
      (arr("a a a"), arr("a a"), 2, 1L),
      // disjoint → 0
      (arr("x y z"), arr("p q r"), 1, 0L),
      // candidate shorter than n → 0 grams → 0
      (arr("a"), arr("a b c"), 2, 0L))
      .toDF("cand", "ref", "n", "expected")
    df.collect() // materialize input
    Seq(1, 2).foreach { n =>
      val got = df.filter($"n" === n)
        .select(ngram_clipped_overlap($"cand", $"ref", n).as("c"), $"expected")
        .collect()
      got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"n=$n row=$r"))
    }
  }

  test("ngram_clipped_overlap: null in → null out, and n >= 1 is enforced") {
    val df = Seq((Array("a", "b"), null.asInstanceOf[Array[String]]))
      .toDF("cand", "ref")
    val got = df.select(ngram_clipped_overlap($"cand", $"ref", 1)).collect()
    assert(got(0).isNullAt(0))
    intercept[IllegalArgumentException] {
      ngram_clipped_overlap($"cand", $"ref", 0)
    }
  }

  test("ngram_clipped_overlap agrees with a naive recount on fixture docs") {
    def naive(cand: Seq[String], ref: Seq[String], n: Int): Long = {
      def grams(t: Seq[String]) = t.sliding(n).filter(_.size == n).map(_.mkString("\u0001")).toSeq
      val rc = grams(ref).groupBy(identity).view.mapValues(_.size).toMap
      grams(cand).groupBy(identity).map { case (g, occ) =>
        math.min(occ.size, rc.getOrElse(g, 0)).toLong }.sum
    }
    val docs = graft.Tables.documents(spark, sf0001).limit(40)
      .select($"doc_id", split($"text", " ").as("ref"),
        slice(split($"text", " "), 3, 1000).as("cand"))
    Seq(1, 2, 3, 4).foreach { n =>
      val got = docs.select($"cand", $"ref",
        ngram_clipped_overlap($"cand", $"ref", n).as("c")).collect()
      got.foreach { r =>
        val cand = r.getSeq[String](0); val ref = r.getSeq[String](1)
        assert(r.getLong(2) == naive(cand, ref, n), s"n=$n doc diverges")
      }
    }
  }

  test("pq_query_lut builds the per-query ADC table in-plan and " +
    "adc_lookup_score over the lut column replays a hand fold") {
    // m=2 subspaces, k=2 codewords, sub=2 dims each; codebook layout
    // (s*k + c)*sub + j (the PqAssignCodes flat layout)
    val cb = Array[Double](
      1.0, 0.0, /* s0 c0 */ 0.0, 1.0, /* s0 c1 */
      0.5, 0.5, /* s1 c0 */ -1.0, 2.0 /* s1 c1 */)
    val q = Seq((7L, Array(2.0, 3.0, 4.0, 5.0))).toDF("q_id", "emb")
    val lut = q.select(pq_query_lut($"emb", cb, 2, 2, 2).as("lut"))
      .head.getSeq[Double](0)
    // lut[s*k + c] = <q_s, codeword(s, c)>
    assert(lut == Seq(2.0, 3.0, 0.5 * 4 + 0.5 * 5, -1.0 * 4 + 2.0 * 5))
    // ADC score of codes (c_0=1, c_1=0): lut[0*2+1] + lut[1*2+0] = 3 + 4.5
    val scored = q
      .select($"q_id", pq_query_lut($"emb", cb, 2, 2, 2).as("lut"))
      .withColumn("codes", typedLit(Seq(1L, 0L)))
      .select(adc_lookup_score($"lut", $"codes", 2).as("adc"))
      .head.getDouble(0)
    assert(scored == 7.5)
  }

  test("hashed_bag_counts matches the explode + hashBucket aggregation exactly") {
    val docs = graft.Tables.documents(spark, sf0001).limit(60)
    val dims = 16
    val viaKernel = docs.select($"doc_id",
        hashed_bag_counts($"text", dims).as("c")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaExplode = docs
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .withColumn("b", graft.operators.Sampling.hashBucket($"t", dims))
      .groupBy($"doc_id", $"b").count().collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(1).toInt -> r.getLong(2)).toMap).toMap
    viaKernel.foreach { case (id, counts) =>
      assert(counts.length == dims)
      val expect = viaExplode(id)
      counts.zipWithIndex.foreach { case (c, j) =>
        assert(c == expect.getOrElse(j, 0L), s"doc $id dim $j") }
    }
    // empty and repeated-separator tokens count like split emits them
    val edge = Seq((1L, "a  b "), (2L, "")).toDF("doc_id", "text")
      .select($"doc_id", hashed_bag_counts($"text", dims).as("c")).collect()
    assert(edge.map(_.getSeq[Long](1).sum).toSeq == Seq(4L, 1L))
  }

  test("unigram_viterbi_pieces: min-cost segmentation, longer-piece ties, " +
    "loud failure on uncovered characters") {
    // micro-unit costs; lower = more probable
    val model = Seq("a" -> 100L, "b" -> 100L, "c" -> 100L,
      "ab" -> 150L, "bc" -> 500L, "abc" -> 120L)
    val df = Seq("abc", "ab", "cab").toDF("w")
    val got = df.select($"w",
      unigram_viterbi_pieces($"w", model, 3).as("p")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // abc: whole-word piece (120) beats ab+c (250) and a+bc (600)
    assert(got("abc") == List("abc"))
    // ab: 150 beats a+b (200)
    assert(got("ab") == List("ab"))
    assert(got("cab") == List("c", "ab"))
    // tie case: cost(xy) == cost(x)+cost(y) → longer piece wins
    val tied = Seq("x" -> 100L, "y" -> 100L, "xy" -> 200L)
    val t = Seq("xy").toDF("w")
      .select(unigram_viterbi_pieces($"w", tied, 2)).collect()
    assert(t(0).getSeq[String](0).toList == List("xy"))
    // a character outside the model is a contract violation, not data
    // (surfaces driver-side when the local relation constant-folds,
    // executor-side wrapped in SparkException otherwise)
    val err = intercept[Exception] {
      Seq("az").toDF("w")
        .select(unigram_viterbi_pieces($"w", model, 3)).collect()
    }
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("unsegmentable")) ||
        mentions(t.getCause))
    assert(mentions(err))
  }

  test("ngram_clipped_overlap stays inside whole-stage codegen") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(split($"text", " ").as("t"))
    val df = docs.select(ngram_clipped_overlap($"t", $"t", 2).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
  }

  test("banded_levenshtein: agrees with the built-in levenshtein whenever " +
    "the band covers the true distance; loud when it cannot certify") {
    val rnd = new scala.util.Random(42)
    def word(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = (1 to 60).map { _ =>
      (word(rnd.nextInt(30)), word(rnd.nextInt(30)))
    } ++ Seq(("", ""), ("", "abc"), ("abc", ""), ("same", "same"))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), levenshtein(col("a"), col("b"))
        .cast("long").as("d"))
      // band exactly the true distance: the tightest certifiable bound
      .select(col("d"), banded_levenshtein(col("a"), col("b"), col("d"))
        .as("bd"),
        // and a generous band
        banded_levenshtein(col("a"), col("b"), col("d") + 7L).as("bd7"))
    df.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getLong(0) == r.getLong(2), r)
    }
    // band below the true distance must FAIL, not return a lower bound
    val e = intercept[Exception] {
      Seq(("aaaa", "bbbb")).toDF("a", "b")
        .select(banded_levenshtein(col("a"), col("b"), lit(2L))).collect()
    }
    assert(e.getMessage.contains("exceeds band") ||
      Option(e.getCause).exists(_.getMessage.contains("exceeds band")),
      e.getMessage)
    // length gap alone beyond the band also fails loudly
    val e2 = intercept[Exception] {
      Seq(("a", "abcdefgh")).toDF("a", "b")
        .select(banded_levenshtein(col("a"), col("b"), lit(3L))).collect()
    }
    assert(e2.getMessage.contains("exceeds band") ||
      Option(e2.getCause).exists(_.getMessage.contains("exceeds band")),
      e2.getMessage)
  }

  test("nfc_normalize composes combining sequences; normalized text passes through") {
    val decomposed = "cafe" + "\u0301"   // e + COMBINING ACUTE (5 codepoints)
    val precomposed = "caf" + "\u00e9"   // precomposed e-acute (4 codepoints)
    val df = Seq((1L, decomposed), (2L, precomposed), (3L, "plain ascii"))
      .toDF("id", "t")
      .select($"id", nfc_normalize($"t").as("n"), length($"t").as("lb"),
        length(nfc_normalize($"t")).as("la"))
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    // the decomposed form must compose to the SAME bytes as the
    // precomposed one — that equality is what digest dedup keys on
    assert(rows(1L).getAs[String]("n") == precomposed)
    assert(rows(2L).getAs[String]("n") == precomposed)
    assert(rows(1L).getAs[Int]("lb") == 5 && rows(1L).getAs[Int]("la") == 4)
    assert(rows(3L).getAs[String]("n") == "plain ascii")
    // null-safety through the expression
    val withNull = Seq((1L, null: String)).toDF("id", "t")
      .select(nfc_normalize($"t")).collect()
    assert(withNull.head.isNullAt(0))
  }
}
