package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Runtime fixture-contract probe — the engine's assumptions about the
  * driver-generated parquet fixtures, checkable in ONE call before any
  * query runs.
  *
  * Why this exists: the driver regenerates the fixtures at will, and
  * encodings have drifted across generations (round 6: `events.ts`
  * changed physical type and 18 queries failed, each with its own
  * cryptic analysis error). [[FixtureContractSpec]] catches drift at
  * `sbt test` time; this probe gives [[Verify]] (the driver's
  * correctness harness) the same tripwire, so a drifted fixture
  * produces one named `PREFLIGHT` error listing every violation
  * instead of a scatter of per-query failures.
  *
  * Deliberately KIND-level, not byte-level: columns the code reads must
  * exist with a compatible kind (numeric / string / timestamp-ish /
  * numeric-array), while physical encodings the ingest adapts to
  * (events.ts — [[Tables.eventsTsType]]) may vary across the supported
  * set.
  */
object Preflight {

  sealed trait Kind
  case object Num extends Kind
  case object Str extends Kind
  case object Ts extends Kind
  case object NumArr extends Kind

  def kindOf(t: DataType): Option[Kind] = t match {
    case _: LongType | _: IntegerType | _: ShortType | _: DoubleType |
         _: FloatType | _: DecimalType => Some(Num)
    case _: StringType => Some(Str)
    case _: TimestampType | _: TimestampNTZType | _: DateType => Some(Ts)
    case ArrayType(e, _) if kindOf(e).contains(Num) => Some(NumArr)
    case _ => None
  }

  /** Every (table, column, kind) the engine reads. `events` is handled
    * separately: its `ts` encoding is probe-adaptive by design. */
  val contract: Map[String, Seq[(String, Kind)]] = Map(
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
    "embeddings" -> Seq("vec_id" -> Num, "embedding" -> NumArr,
      "label" -> Num))

  /** All contract violations under `sfDir`, each as one
    * `table.column: what's wrong` line; empty = fixtures are usable. */
  def problems(s: SparkSession, sfDir: String): Seq[String] = {
    val schemaProblems = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      scala.util.Try(Tables(s, sfDir, table).schema) match {
        case scala.util.Failure(e) =>
          Seq(s"$table: unreadable at $sfDir/$table.parquet — ${e.getMessage}")
        case scala.util.Success(schema) =>
          cols.flatMap { case (name, want) =>
            schema.find(_.name == name) match {
              case None => Some(s"$table.$name: MISSING " +
                s"(fixture has ${schema.fieldNames.mkString(", ")})")
              case Some(f) if !kindOf(f.dataType).contains(want) =>
                Some(s"$table.$name: expected $want-kind, fixture has ${f.dataType}")
              case _ => None
            }
          }
      }
    }
    val eventsProblems =
      try {
        Tables.eventsTsType(s, s"$sfDir/events.parquet") // throws, named, on drift
        val ev = Tables.events(s, sfDir)
        val tsBad =
          if (ev.schema("ts").dataType == TimestampType) Nil
          else Seq(s"events.ts: adaptive ingest landed on " +
            s"${ev.schema("ts").dataType}, expected TimestampType")
        tsBad ++ Seq("event_id", "user_id", "event_type", "value", "props")
          .filterNot(ev.schema.fieldNames.contains)
          .map(c => s"events.$c: MISSING")
      } catch {
        case e: Throwable => Seq(s"events: ${e.getMessage}")
      }
    schemaProblems ++ eventsProblems
  }

  /** One-call gate: throws with every violation named if the fixtures
    * under `sfDir` have drifted away from the engine's contract. */
  def check(s: SparkSession, sfDir: String): Unit = {
    val p = problems(s, sfDir)
    require(p.isEmpty,
      s"fixture drift at $sfDir — fix the ingest (Tables.scala) first:\n  " +
        p.mkString("\n  "))
  }
}
