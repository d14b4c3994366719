package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 model of the reference's paged HTTP JSON users source
  * (S1, /root/reference/src/lib/users.js:1-63 — `?results=500` per fetch).
  *
  * The reference fetches one page on one node; the 100 TB shape is this:
  * the driver plans one `InputPartition` PER PAGE, executors "fetch" pages
  * in parallel, and both column pruning AND key-equality predicates are
  * pushed into the scan:
  *   - `SupportsPushDownRequiredColumns` — `select(id)` never materializes
  *     the other fields;
  *   - `SupportsPushDownFilters` — `id = 'user-123'` (the reference's S5
  *     point fetch, pages/launch/[id].js:36-46) prunes the plan to the ONE
  *     page that can contain the row, instead of scanning every page.
  *
  * Per-page failure isolation (the reference's S2 per-endpoint isolation,
  * src/lib/spacex.js:39-47): a failing page fetch is simulated with the
  * `failPages` option; `pageFailureMode` decides whether the job fails
  * (`fail`, default — a real fetch error surfaces), the page is dropped
  * (`skip`), or the page yields the reference's static fallback rows
  * (`fallback`, users.js:81-111 shape) — the other pages are unaffected
  * either way.
  *
  * Rows are generated deterministically in place of a network call
  * (zero-egress container) — swap `UsersPageReader.field` for an HTTP GET
  * and the plumbing is unchanged.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-users")
  *     .option("rows", 5000).option("pageSize", 500).load()
  * }}}
  */
class UsersApiSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-users"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UsersApiSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties) // keys arrive as typed
    new UsersApiTable(opts.getLong("rows", 500L), opts.getInt("pageSize", 500),
      failPages = Option(opts.get("failPages")).map(_.split(",").map(_.trim.toInt).toSet)
        .getOrElse(Set.empty),
      failureMode = opts.getOrDefault("pageFailureMode", "fail"))
  }
}

object UsersApiSource {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("email", StringType, nullable = false),
    StructField("country", StringType, nullable = false),
    StructField("age", IntegerType, nullable = false),
    StructField("valid", BooleanType, nullable = false)))

  /** The reference's static fallback users (users.js:81-111), as row tuples
    * keyed off the failing page so ids stay unique across failed pages. */
  private[sources] val fallbackRows = Seq(
    ("Alice Anderson", "alice@example.com", "US", 34, true),
    ("Bob Brown", "bob@example.com", "DE", 28, true),
    ("Carol Clark", "", "US", 41, false))
}

private[sources] class UsersApiTable(rows: Long, pageSize: Int,
                                     failPages: Set[Int], failureMode: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft_users(rows=$rows)"
  override def schema(): StructType = UsersApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new UsersScanBuilder(rows, pageSize, failPages, failureMode)
}

private[sources] class UsersScanBuilder(rows: Long, pageSize: Int,
                                        failPages: Set[Int], failureMode: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = UsersApiSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept `id = <literal>` equality — the paged API can serve a point
    * lookup from the single page that covers the key's index, so the
    * filter is consumed here (not re-evaluated post-scan) and the page
    * list shrinks to ≤ 1 per key. Everything else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("id", _: String) => true
      case _ => false
    }
    pushed = accepted
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-users rows=$rows pageSize=$pageSize cols=${required.fieldNames.mkString(",")}" +
        (if (pushed.nonEmpty) s" PushedFilters: ${pushed.mkString("[", ", ", "]")}" else "")

    /** Accepted filters are ANDed: with one pushed key the scan covers its
      * single page; two DIFFERENT pushed keys are unsatisfiable → zero
      * pages. A malformed or out-of-range key matches no row → zero pages.
      *
      * The key must round-trip EXACTLY (`"user-$i"` re-rendered equals the
      * literal): this filter was reported as pushed, so Spark never
      * re-applies it — a loose parse ("user-007" or "user-+7" → 7) would
      * plan page 0 and hand back row user-7 for a predicate that matches
      * nothing. Canonical ids only; everything else is zero pages. */
    private def keyOfPushed: Option[Option[Long]] = {
      val vals = pushed.collect { case EqualTo("id", v: String) => v }.toSet
      if (vals.isEmpty) None // no pushed key: full scan
      else if (vals.size > 1) Some(None) // contradictory equalities
      else Some(vals.head.stripPrefix("user-").toLongOption
        .filter(i => vals.head == s"user-$i" && i >= 0 && i < rows))
    }

    override def planInputPartitions(): Array[InputPartition] = {
      val pageFilter: Int => Boolean = keyOfPushed match {
        case None => _ => true
        case Some(None) => _ => false
        case Some(Some(idx)) => p => p == (idx / pageSize).toInt
      }
      val pages = ((rows + pageSize - 1) / pageSize).toInt
      (0 until pages).filter(pageFilter).map { p =>
        val start = p.toLong * pageSize
        UsersPage(p, start, math.min(start + pageSize, rows)): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val cols = required.fieldNames // serialized to executors
      val key: Option[Long] = keyOfPushed.flatten
      val failing = failPages
      val mode = failureMode
      (partition: InputPartition) => {
        val page = partition.asInstanceOf[UsersPage]
        new UsersPageReader(page, cols, key, failing.contains(page.index), mode)
      }
    }
  }
}

private[sources] final case class UsersPage(index: Int, start: Long, end: Long)
    extends InputPartition

/** One "page fetch": generates rows [start, end). Deterministic stand-in
  * for `fetch(apiUrl + "&page=" + p)`. A pushed key filter is applied
  * inside the "response" scan, so a point lookup returns exactly its row.
  * A simulated fetch failure follows `mode`: fail | skip | fallback. */
private[sources] class UsersPageReader(page: UsersPage, cols: Array[String],
                                       key: Option[Long],
                                       failed: Boolean, mode: String)
    extends PartitionReader[InternalRow] {
  private var i = page.start - 1
  private val countries = Array("US", "DE", "FR", "JP", "BR", "IN", "CN", "AU")
  private var fallbackIdx = -1

  override def next(): Boolean =
    if (failed) mode match {
      case "fail" => throw new java.io.IOException(
        s"simulated fetch failure for users page ${page.index}")
      case "skip" => false
      case "fallback" =>
        // a pushed id-equality filter was CONSUMED by this scan (Spark will
        // not re-apply it), so it must hold here too: fallback ids are
        // "fallback-*", which can never match a pushed "user-<n>" key —
        // a point lookup on a failed page correctly finds nothing
        if (key.isDefined) false
        else { fallbackIdx += 1; fallbackIdx < UsersApiSource.fallbackRows.length }
      case other => throw new IllegalArgumentException(
        s"pageFailureMode must be fail|skip|fallback, got '$other'")
    } else {
      i += 1
      while (i < page.end && !key.forall(_ == i)) i += 1
      i < page.end
    }

  private def field(name: String): Any = name match {
    case "id" => UTF8String.fromString(s"user-$i")
    case "name" => UTF8String.fromString(s"User ${('A' + (i % 26)).toChar}. Number$i")
    case "email" => UTF8String.fromString(if (i % 7 == 0) "" else s"user$i@example.com")
    case "country" => UTF8String.fromString(countries((i % countries.length).toInt))
    case "age" => (18 + (i % 60)).toInt
    case "valid" => i % 7 != 0
  }

  private def fallbackField(name: String): Any = {
    val (n, e, c, a, v) = UsersApiSource.fallbackRows(fallbackIdx)
    name match {
      case "id" => UTF8String.fromString(s"fallback-${page.index}-$fallbackIdx")
      case "name" => UTF8String.fromString(n)
      case "email" => UTF8String.fromString(e)
      case "country" => UTF8String.fromString(c)
      case "age" => a
      case "valid" => v
    }
  }

  override def get(): InternalRow =
    if (failed) InternalRow.fromSeq(cols.toIndexedSeq.map(fallbackField))
    else InternalRow.fromSeq(cols.toIndexedSeq.map(field))
  override def close(): Unit = ()
}
