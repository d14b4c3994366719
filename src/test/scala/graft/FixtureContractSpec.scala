package graft

import org.apache.spark.sql.types._

/** The engine's ASSUMPTIONS about the driver-generated fixtures, stated as
  * one spec — so the next fixture regeneration that drifts (round 6:
  * `events.ts` changed physical encoding and 18 tests failed with one
  * cryptic error each) fails HERE first, with a message naming the table
  * and column, instead of as a scatter of downstream analysis errors.
  *
  * Deliberately kind-level, not byte-level: columns the code reads must
  * exist with a compatible KIND (numeric/string/timestamp-ish/array),
  * while physical encodings the ingest adapts to (events.ts — see
  * [[Tables.eventsTsType]]) are allowed to vary across the supported set.
  */
class FixtureContractSpec extends SparkTestBase {

  private sealed trait Kind
  private case object Num extends Kind
  private case object Str extends Kind
  private case object Ts extends Kind
  private case object FloatArr extends Kind

  private def kindOf(t: DataType): Option[Kind] = t match {
    case _: LongType | _: IntegerType | _: ShortType | _: DoubleType |
         _: FloatType | _: DecimalType => Some(Num)
    case _: StringType => Some(Str)
    case _: TimestampType | _: TimestampNTZType | _: DateType => Some(Ts)
    case ArrayType(e, _) if kindOf(e).contains(Num) => Some(FloatArr)
    case _ => None
  }

  private val contract: Map[String, Seq[(String, Kind)]] = Map(
    "region" -> Seq("r_regionkey" -> Num, "r_name" -> Str),
    "nation" -> Seq("n_nationkey" -> Num, "n_name" -> Str, "n_regionkey" -> Num),
    "customer" -> Seq("c_custkey" -> Num, "c_name" -> Str,
      "c_nationkey" -> Num, "c_acctbal" -> Num, "c_mktsegment" -> Str),
    "supplier" -> Seq("s_suppkey" -> Num, "s_name" -> Str,
      "s_nationkey" -> Num, "s_acctbal" -> Num),
    "part" -> Seq("p_partkey" -> Num, "p_name" -> Str, "p_brand" -> Str,
      "p_type" -> Str, "p_size" -> Num, "p_retailprice" -> Num),
    "orders" -> Seq("o_orderkey" -> Num, "o_custkey" -> Num,
      "o_orderstatus" -> Str, "o_totalprice" -> Num,
      "o_orderdate" -> Ts, "o_orderpriority" -> Str),
    "lineitem" -> Seq("l_orderkey" -> Num, "l_partkey" -> Num,
      "l_suppkey" -> Num, "l_linenumber" -> Num, "l_quantity" -> Num,
      "l_extendedprice" -> Num, "l_discount" -> Num, "l_tax" -> Num,
      "l_returnflag" -> Str, "l_linestatus" -> Str, "l_shipdate" -> Ts),
    "documents" -> Seq("doc_id" -> Num, "text" -> Str, "lang" -> Str,
      "source" -> Str, "n_chars" -> Num),
    "embeddings" -> Seq("vec_id" -> Num, "embedding" -> FloatArr,
      "label" -> Num))

  test("every fixture table carries the columns the engine reads, kind-compatible") {
    val problems = for {
      (table, cols) <- contract.toSeq.sortBy(_._1)
      schema = Tables(spark, sf0001, table).schema
      (name, want) <- cols
      problem <- schema.find(_.name == name) match {
        case None => Some(s"$table.$name: MISSING (fixture has ${schema.fieldNames.mkString(", ")})")
        case Some(f) if !kindOf(f.dataType).contains(want) =>
          Some(s"$table.$name: expected $want-kind, fixture has ${f.dataType}")
        case _ => None
      }
    } yield problem
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
}
