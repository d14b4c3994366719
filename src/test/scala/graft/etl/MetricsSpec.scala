package graft.etl

import graft.{Fixtures, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class MetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("A1–A5 metrics on the fallback-user fixture") {
    val users = Fixtures.users.toDF()
    val m = Metrics.summary(users, $"valid" && $"email" =!= "",
      $"country", $"name", $"id").collect()(0)
    assert(m.getAs[Long]("rows_in") == 3)
    assert(m.getAs[Long]("rows_out") == 2)
    assert(m.getAs[Long]("dedup_removed") == 1)
    assert(m.getAs[Long]("countries") == 2)
    assert(m.getAs[String]("last_record") == "Carol Clark") // max id = demo-3
  }

  test("metrics invariant: rows_out + dedup_removed == rows_in (property)") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.alphaNumStr, Gen.oneOf(true, false)))
    (0 until 10).foreach { i =>
      val data = gen.apply(Gen.Parameters.default, Seed(42L + i)).get
      val df = data.toDF("name", "ok")
      val m = Metrics.summary(df, $"ok", $"name", $"name", $"name").collect()(0)
      assert(m.getAs[Long]("rows_out") + m.getAs[Long]("dedup_removed") ==
        m.getAs[Long]("rows_in"))
    }
  }

  test("A8 zero-row fallback substitutes the mock metrics row") {
    val empty = spark.emptyDataFrame
      .withColumn("rows_in", lit(0L)).limit(0)
    val fb = Extract.fallbackMetrics(spark)
    val out = Metrics.withFallback(empty, fb)
    assert(out.collect()(0).getAs[Long]("rows_in") == 1240L)
  }

  test("A4 HLL approx distinct tracks exact within configured error") {
    val df = graft.Tables.customer(spark, sf0001)
    val r = Metrics.summaryApprox(df, col("c_custkey")).collect()(0)
    val exact = r.getAs[Long]("exact_distinct").toDouble
    val approx = r.getAs[Long]("approx_distinct").toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("integrityAudit counts each violation class exactly once") {
    import spark.implicits._
    val fact = Seq(
      (1L, Option(10L), 5.0),   // clean
      (2L, Option(10L), -1.0),  // non-positive measure
      (2L, Option(10L), 3.0),   // duplicate pk
      (3L, None, 2.0),          // null fk (NOT an orphan: null joins nothing but is its own class)
      (4L, Option(99L), 1.0))   // orphan fk
      .toDF("pk", "fk", "m")
    val dim = Seq(10L).toDF("k")
    val r = Metrics.integrityAudit(fact, dim,
      col("pk"), col("fk"), col("k"), col("m")).collect()(0)
    assert(r.getAs[Long]("n_rows") == 5)
    assert(r.getAs[Long]("n_null_fk") == 1)
    assert(r.getAs[Long]("n_nonpositive") == 1)
    assert(r.getAs[Long]("n_dup_pk") == 1)
    // anti join: both the unknown fk AND the null fk fail to find a dim row
    assert(r.getAs[Long]("n_orphans") == 2)
  }
}
