package graft.etl

import graft.{Fixtures, SparkTestBase}
import graft.functions._
import org.apache.spark.sql.functions._

class TransformSpec extends SparkTestBase {
  import spark.implicits._

  test("P1 enrich: synthesized id, trimmed name, JS-falsy defaults, valid flag") {
    val users = Fixtures.users.toDF()
    val enriched = users.select(
      jsCoalesce($"id", concat(lit("user-"), monotonically_increasing_id())).as("id"),
      trim(concat_ws(" ", $"name")).as("name"),
      jsCoalesce($"email", lit("missing@example.com")).as("email"),
      lit(true).as("flagged_valid"))
    val got = enriched.collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(got.contains(("demo-3", "missing@example.com"))) // '' treated as missing
    assert(got.map(_._1).toSet == Set("demo-1", "demo-2", "demo-3"))
  }

  test("F1 validity filter drops invalid/empty-email rows (users.js:67)") {
    val users = Fixtures.users.toDF()
    val out = users.filter($"valid" && $"email" =!= "")
    assert(out.count() == 2)
    assert(!out.collect().map(_.getAs[String]("id")).contains("demo-3"))
  }

  test("F5 point lookup compares keys as strings (loose ==)") {
    val df = Seq((42L, "a"), (7L, "b")).toDF("key", "v")
    assert(Transform.pointLookup(df, "key", "42").collect().map(_.getString(1)).toSeq == Seq("a"))
  }

  test("J1 lookup join: left outer with default-on-miss struct value") {
    val launches = Fixtures.launches.toDF()
    val rockets = Fixtures.rockets.toDF()
    val out = Transform.lookupJoin(launches, rockets, "rocketFk", "id",
      Seq("rname" -> "rocket_name"),
      Map("rocket_name" -> col("rocketFk"))) // miss → FK itself (spacex.js:32)
    val byId = out.collect().map(r => r.getAs[String]("id") -> r.getAs[String]("rocket_name")).toMap
    assert(byId("l1") == "Falcon Demo")
    assert(byId("l2") == "rk-missing") // join miss keeps the raw FK
  }

  test("U1 union tolerates missing columns (allowMissingColumns)") {
    val a = Seq((1, "x")).toDF("k", "extra")
    val b = Seq(2).toDF("k")
    val out = Transform.unionAll(a, b)
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("k", "extra"))
    assert(out.filter($"extra".isNull).count() == 1)
  }

  test("L1 tailN returns the last N in explicit order with tiebreak") {
    val df = (1 to 10).map(i => (i.toLong, s"r$i")).toDF("ord", "v")
    val got = Transform.tailN(df, "ord", "ord", 3).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L, 9L, 8L))
  }

  test("withIngestOrder yields dense stable row numbers") {
    val df = Seq(30L, 10L, 20L).toDF("k")
    val got = Transform.withIngestOrder(df, "k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(10L -> 1, 20L -> 2, 30L -> 3))
  }

  test("withIngestOrder equals single-partition row_number on shuffled multi-partition input") {
    val n = 1000
    val xs = new scala.util.Random(7).shuffle((1 to n).toList).map(_.toLong)
    val df = xs.toDF("k").repartition(13)
    val got = Transform.withIngestOrder(df, "k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // dense 1..n in key order — exactly row_number() over a global sort,
    // but computed with per-partition windows + offsets (no 1-task stage)
    assert(got == (1 to n).map(i => i.toLong -> i).toMap)
  }

  test("upsert replaces matched keys, passes through the rest, adds new ones") {
    val current = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "status", "v")
    val updates = Seq((2L, "B", 20.0), (9L, "new", 9.0)).toDF("k", "status", "v")
    val got = Transform.upsert(current, updates, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0), (9L, "new", 9.0)))
  }
}
