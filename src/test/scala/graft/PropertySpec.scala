package graft

import graft.etl.Transform
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY.md §5.2(3): property-based invariants over generated inputs. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val rowsGen = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 50L), Gen.alphaNumStr))

  test("U1: union-all count equals the sum of input counts") {
    (0 until 8).foreach { i =>
      val a = sample(rowsGen, 100L + i).toDF("k", "v")
      val b = sample(rowsGen, 200L + i).toDF("k", "v")
      assert(Transform.unionAll(a, b).count() == a.count() + b.count())
    }
  }

  test("J1: left-outer lookup join preserves every fact row exactly once") {
    (0 until 8).foreach { i =>
      val fact = sample(rowsGen, 300L + i).toDF("k", "v")
      val dim = sample(Gen.listOf(Gen.chooseNum(0L, 20L)), 400L + i)
        .distinct.map(k => (k, s"d$k")).toDF("dk", "dv")
      val joined = Transform.lookupJoin(fact, dim, "k", "dk",
        Seq("dv" -> "dim_value"), Map("dim_value" -> lit("Unknown")))
      assert(joined.count() == fact.count()) // dim keys unique ⇒ no fanout
      assert(joined.filter(col("dim_value").isNull).count() == 0) // default fills
    }
  }

  test("L1+L2: tailN/headN never exceed N and are subsets of the input") {
    (0 until 5).foreach { i =>
      val df = sample(rowsGen, 500L + i).toDF("k", "v").distinct()
      val n = 5
      val tail = Transform.tailN(df, "k", "v", n)
      val head = Transform.headN(df, "k", n)
      assert(tail.count() <= n && head.count() <= n)
      assert(tail.except(df).isEmpty && head.except(df).isEmpty)
    }
  }

  test("MIX4: oversample multiplicity is always floor(rate) or ceil(rate)") {
    import graft.operators.Sampling
    (0 until 5).foreach { i =>
      val rate = Seq(0.3, 1.0, 1.7, 2.5, 3.0)(i)
      val df = (1L to 400L).map(k => (k, "s")).toDF("doc_id", "source")
      val out = Sampling.oversampleMix(df, col("source"), col("doc_id"),
        Map("s" -> rate), defaultRate = 0.0)
      val per = out.groupBy("doc_id").count()
        .collect().map(_.getLong(1)).toSet
      val lo = math.floor(rate).toLong
      val expected = if (rate == lo) Set(lo) else Set(lo, lo + 1) - 0L
      assert(per.subsetOf(expected + math.max(lo, 1L)),
        s"rate=$rate multiplicities=$per")
      // total mass tracks rate within hash granularity
      val total = out.count().toDouble / 400
      assert(math.abs(total - rate) < 0.15, s"rate=$rate got $total")
    }
  }

  test("SHUF1: epoch shuffle is a permutation for any shard count") {
    import graft.operators.Sampling
    val df = (1L to 300L).map(k => (k, s"t$k")).toDF("doc_id", "v")
    Seq(1, 3, 8, 32).foreach { shards =>
      val m = Sampling.epochShuffle(df, col("doc_id"), epoch = 3, shards = shards)
      assert(m.count() == 300)
      val bad = m.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"),
          countDistinct("pos").as("d"))
        .filter(col("mx") =!= col("n") || col("d") =!= col("n")).count()
      assert(bad == 0, s"shards=$shards")
      assert(m.select("shard").distinct().count() <= shards)
    }
  }

  test("RRF1: adding an arm never decreases any fused score") {
    import graft.operators.Retrieval
    val a = (1L to 30L).map(d => (d, d.toInt)).toDF("doc_id", "rank")
    val b = (1L to 30L).map(d => (31L - d, d.toInt)).toDF("doc_id", "rank")
    val one = Retrieval.rrfFuse(Seq(a), topK = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val two = Retrieval.rrfFuse(Seq(a, b), topK = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(one.forall { case (d, s) => two(d) >= s })
  }

  test("BUDGET1: allocation never exceeds the budget; epochs within [0, maxEpochs]") {
    import graft.operators.Curation
    val wordGen = Gen.chooseNum(1, 40)
    (0 until 6).foreach { i =>
      val rows = sample(Gen.nonEmptyListOf(
        Gen.zip(Gen.chooseNum(0, 4), wordGen)), 900L + i)
        .zipWithIndex.map { case ((src, nTok), id) =>
          (id.toLong, Seq.fill(nTok)("w").mkString(" "), s"s$src")
        }
      val got = Curation.epochAllocation(rows.toDF("doc_id", "text", "source"))
        .collect()
      val budget = got.head.getLong(5)
      assert(got.map(_.getLong(3)).sum <= budget, s"seed $i over budget")
      got.foreach { r =>
        val e = r.getLong(2)
        assert(e >= 0 && e <= 6, s"seed $i epochs $e")
        assert(r.getLong(3) == e * r.getLong(1))
      }
    }
  }

  test("PREF1: every doc joins at most one pair; chosen always out-scores rejected") {
    import graft.operators.Curation
    (0 until 6).foreach { i =>
      val rows = sample(Gen.nonEmptyListOf(
        Gen.zip(Gen.chooseNum(1, 60), Gen.chooseNum(0, 2))), 950L + i)
        .zipWithIndex.map { case ((nTok, g), id) =>
          val t = Seq.fill(nTok)("w").mkString(" ")
          (id.toLong, t, "en", s"g$g", t.length.toLong)
        }
      val got = Curation.preferencePairs(
        rows.toDF("doc_id", "text", "lang", "source", "n_chars")).collect()
      val used = got.map(_.getLong(3)) ++ got.map(_.getLong(4))
      assert(used.distinct.length == used.length, s"seed $i doc reused")
      got.foreach { r =>
        assert(r.getDouble(5) > r.getDouble(6), s"seed $i inverted pair")
        assert(r.getDouble(7) >= 0.05, s"seed $i margin")
      }
    }
  }

  test("CURR1: curriculum order is a permutation and respects the band macro-order") {
    import graft.operators.Sampling
    (0 until 4).foreach { i =>
      val rows = sample(Gen.nonEmptyListOf(Gen.chooseNum(1, 30)), 980L + i)
        .zipWithIndex.map { case (nTok, id) =>
          (id.toLong, (1 to nTok).map(t => s"w${(t * (id + 1)) % 7}")
            .mkString(" "), if (id % 2 == 0) "en" else "de")
        }
      val df = rows.toDF("doc_id", "text", "lang")
      val got = Sampling.curriculumOrder(df, shards = 3).collect()
      assert(got.length == rows.length)
      assert(got.map(_.getLong(0)).distinct.length == rows.length)
      got.groupBy(r => (r.getInt(2), r.getLong(4))).foreach { case (g, rs) =>
        assert(rs.map(_.getLong(5)).sorted.toSeq == (1L to rs.length).toSeq,
          s"seed $i group $g not dense")
      }
    }
  }
}
