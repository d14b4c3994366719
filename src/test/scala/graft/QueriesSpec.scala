package graft

import org.apache.spark.sql.types.{ArrayType, StructType}

/** Shape assertions for the queries whose ORACLE rows are serialized
  * projections: the genuinely nested in-plan structures (array<struct>
  * re-nest, default-struct-on-miss) are pinned here, since the driver's
  * pandas harness cannot sort/hash nested cells. */
class QueriesSpec extends SparkTestBase {

  test("j3NestedFrame re-nests the membership join as array<struct> per order") {
    val nested = Queries.j3NestedFrame(spark, sf0001)
    val payloadsType = nested.schema("payloads").dataType
    assert(payloadsType.isInstanceOf[ArrayType])
    val elem = payloadsType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(elem.fieldNames.toSeq == Seq("pid", "name", "cents"))
    val row = nested.orderBy("l_orderkey").head()
    val arr = row.getSeq[org.apache.spark.sql.Row](1)
    assert(arr.nonEmpty)
    // sorted by pid (unique per order after the distinct) — deterministic
    val pids = arr.map(_.getLong(0))
    assert(pids == pids.sorted)
    // struct payload carries the joined dimension values
    assert(arr.forall(st => st.getString(1).nonEmpty && st.getLong(2) > 0))
  }

  test("e3NestedFrame replaces the FK with a struct; miss yields the default struct") {
    val nested = Queries.e3NestedFrame(spark, sf0001)
    val custType = nested.schema("customer").dataType.asInstanceOf[StructType]
    assert(custType.fieldNames.toSeq == Seq("id", "name", "segment", "nation"))
    val all = nested.collect()
    val (hits, misses) = all.partition(r => !r.getStruct(3).isNullAt(0))
    assert(hits.nonEmpty && misses.nonEmpty) // acctbal>9000 dim forces misses
    // hit: struct carries the joined dimension row
    assert(hits.forall { r =>
      val c = r.getStruct(3); c.getString(1).nonEmpty && !c.isNullAt(3)
    })
    // miss: {name: <raw FK>} default struct (spacex.js:32 `launch.rocket ||
    // 'Unknown'`), other fields null — the FK is a numeric custkey, so the
    // defaulted name is its digits
    assert(misses.forall { r =>
      val c = r.getStruct(3)
      c.getString(1).nonEmpty && c.getString(1).forall(_.isDigit) &&
        c.isNullAt(2) && c.isNullAt(3)
    })
  }

  test("w9 keeps ties: at most 3 distinct values but potentially many rows per flag") {
    val rows = Queries.w9TopkTies(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val byFlag = rows.groupBy(_._1)
    for ((flag, fr) <- byFlag) {
      val values = fr.map(_._2).distinct
      assert(values.length <= 3, s"$flag carries ${values.length} values")
      assert(fr.length >= values.length, flag) // ties kept, never truncated
    }
  }

  test("chi1 statistic is non-negative with the right degrees of freedom") {
    val r = Queries.chi1Independence(spark, sf0001).head()
    assert(r.getDouble(0) >= 0.0)
    val ev = Tables.events(spark, sf0001)
    val types = ev.select("event_type").distinct().count()
    assert(r.getLong(1) == (types - 1) * 6) // 7 ISO weekdays in the fixture
    assert(r.getLong(2) == ev.count())
  }
}
