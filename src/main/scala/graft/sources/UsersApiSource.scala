package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
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
  * in parallel, and column pruning is pushed into the scan
  * (`SupportsPushDownRequiredColumns`), so `select(id)` never materializes
  * the other fields. Rows are generated deterministically in place of a
  * network call (zero-egress container) — swap `UsersPageReader.row` for an
  * HTTP GET and the plumbing is unchanged.
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
    new UsersApiTable(opts.getLong("rows", 500L), opts.getInt("pageSize", 500))
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
}

private[sources] class UsersApiTable(rows: Long, pageSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_users(rows=$rows)"
  override def schema(): StructType = UsersApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new UsersScanBuilder(rows, pageSize)
}

private[sources] class UsersScanBuilder(rows: Long, pageSize: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = UsersApiSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-users rows=$rows pageSize=$pageSize cols=${required.fieldNames.mkString(",")}"

    override def planInputPartitions(): Array[InputPartition] = {
      val pages = ((rows + pageSize - 1) / pageSize).toInt
      (0 until pages).map { p =>
        val start = p.toLong * pageSize
        UsersPage(start, math.min(start + pageSize, rows)): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val cols = required.fieldNames // serialized to executors
      (partition: InputPartition) => {
        val page = partition.asInstanceOf[UsersPage]
        new UsersPageReader(page.start, page.end, cols)
      }
    }
  }
}

private[sources] final case class UsersPage(start: Long, end: Long) extends InputPartition

/** One "page fetch": generates rows [start, end). Deterministic stand-in
  * for `fetch(apiUrl + "&page=" + p)`. */
private[sources] class UsersPageReader(start: Long, end: Long, cols: Array[String])
    extends PartitionReader[InternalRow] {
  private var i = start - 1
  private val countries = Array("US", "DE", "FR", "JP", "BR", "IN", "CN", "AU")

  override def next(): Boolean = { i += 1; i < end }

  private def field(name: String): Any = name match {
    case "id" => UTF8String.fromString(s"user-$i")
    case "name" => UTF8String.fromString(s"User ${('A' + (i % 26)).toChar}. Number$i")
    case "email" => UTF8String.fromString(if (i % 7 == 0) "" else s"user$i@example.com")
    case "country" => UTF8String.fromString(countries((i % countries.length).toInt))
    case "age" => (18 + (i % 60)).toInt
    case "valid" => i % 7 != 0
  }

  override def get(): InternalRow = InternalRow.fromSeq(cols.toIndexedSeq.map(field))
  override def close(): Unit = ()
}
