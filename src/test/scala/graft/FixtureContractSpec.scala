package graft

import org.apache.spark.sql.types._

/** The engine's ASSUMPTIONS about the driver-generated fixtures, stated as
  * one spec — so the next fixture regeneration that drifts (round 6:
  * `events.ts` changed physical encoding and 18 tests failed with one
  * cryptic error each) fails HERE first, with a message naming the table
  * and column, instead of as a scatter of downstream analysis errors.
  *
  * The contract itself lives in [[Preflight]] (main code), because the
  * same probe now also gates [[Verify]] at driver-run time — this spec is
  * the `sbt test` entry point for it, plus the events-encoding checks
  * that need a concrete fixture.
  */
class FixtureContractSpec extends SparkTestBase {

  test("every fixture table carries the columns the engine reads, kind-compatible") {
    val problems = Preflight.problems(spark, sf0001)
    assert(problems.isEmpty,
      "fixture drift — fix the ingest (Tables.scala), then these downstream:\n  " +
        problems.mkString("\n  "))
  }

  test("events adapts to every supported ts encoding and rejects the rest loudly") {
    // the one fixture column with a DOCUMENTED drift history: the probe
    // must classify the current generation as a supported encoding...
    val t = Tables.eventsTsType(spark, s"$sf0001/events.parquet")
    assert(t == LongType || t == TimestampType || t == TimestampNTZType)
    // ...and the adaptive reader must land every generation on the session
    // TimestampType with the other columns intact (names the streams use)
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == TimestampType)
    for (c <- Seq("event_id", "user_id", "event_type", "value", "props"))
      assert(ev.schema.fieldNames.contains(c), s"events.$c missing")
  }

  test("preflight reports a drifted directory with named violations, not a scatter") {
    // a directory holding only SOME tables: every missing table must be
    // named; the events probe must degrade to one message too
    val dir = java.nio.file.Files.createTempDirectory("preflight").toString
    try {
      // copy one real table in so the probe sees a mixed state
      Tables(spark, sf0001, "region").write.mode("overwrite")
        .parquet(s"$dir/region.parquet")
      val problems = Preflight.problems(spark, dir)
      // every OTHER contract table reports unreadable, region is clean
      // (column problems print "region.", an unreadable table "region:")
      assert(!problems.exists(p => p.startsWith("region.") || p.startsWith("region:")))
      for (t <- Preflight.contract.keys if t != "region")
        assert(problems.exists(_.startsWith(s"$t:")), s"no problem line for $t")
      assert(problems.exists(_.startsWith("events")))
      // and the one-call gate throws with all of them in the message
      val e = intercept[IllegalArgumentException](Preflight.check(spark, dir))
      assert(e.getMessage.contains("fixture drift"))
    } finally graft.util.Fs.rmTree(java.nio.file.Paths.get(dir))
  }
}
