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
}
