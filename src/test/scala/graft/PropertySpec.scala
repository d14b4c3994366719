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
}
