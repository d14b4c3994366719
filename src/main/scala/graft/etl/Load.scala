package graft.etl

import org.apache.spark.sql.DataFrame

/** Load-stage sinks K1–K4 (SURVEY.md §2.2).
  *
  * Reference: JSON API envelope (pages/api/etl/restart.js:14-20), CSV export
  * with every value quoted and `"` doubled (pages/index.js:105-131,426-430),
  * top-N previews (pages/index.js:228,268). Spark's CSV writer is RFC-4180,
  * which matches the reference's hand-rolled quoting exactly when
  * `quoteAll` is on.
  */
object Load {

  /** K2 — CSV export: header + quote-all, `"` → `""`, null → empty.
    * Spark's writer defaults to backslash-escaping; RFC-4180 doubling (what
    * the reference hand-rolls, pages/index.js:426-430) needs escape='"'. */
  def csv(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      .option("emptyValue", "\"\"")
      .csv(out)

  /** Small-file compaction — the lake-maintenance pass: rewrite a parquet
    * directory into `numFiles` right-sized files (a 100 TB table
    * accumulating thousands of tiny per-batch files pays for it in
    * open/list overhead on every scan). Writes beside the target and
    * swaps, so a failure mid-compact leaves the original intact. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              numFiles: Int): Unit = {
    import java.nio.file.{Files, Paths}
    import graft.util.Fs.rmTree
    val tmp = Paths.get(dir + ".compacting")
    val old = Paths.get(dir + ".precompact")
    val target = Paths.get(dir)
    // recover from a previously interrupted compact before starting a new
    // one — a stale .precompact would otherwise wedge every future run
    if (Files.exists(old) && !Files.exists(target)) Files.move(old, target)
    else if (Files.exists(old)) rmTree(old)
    rmTree(tmp)
    spark.read.parquet(dir).repartition(numFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap order keeps a complete copy live at every step: a crash before
    // the second move leaves the original at `.precompact`, never nothing
    Files.move(target, old)
    Files.move(tmp, target)
    rmTree(old)
  }

  /** File manifest of a hive-layout parquet directory, in the shape
    * [[graft.operators.Layout.compactionPlan]] consumes — (part, file_id,
    * file, bytes), `file_id` ordered by file name within each partition.
    * Listing is metadata-sized work; at 100 TB this frame comes from the
    * table format's manifest store rather than an FS walk — the SHAPE
    * (one row per data file, keyed by partition) is the contract, and
    * the plan over it stays a dataframe computation either way. */
  def parquetManifest(spark: org.apache.spark.sql.SparkSession,
                      dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import graft.util.Fs.listDir
    val rows = listDir(Paths.get(dir))
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
      .sortBy(_.getFileName.toString)
      .flatMap { pd =>
        val part = pd.getFileName.toString
        listDir(pd)
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .sortBy(_.getFileName.toString).zipWithIndex
          .map { case (f, i) => (part, i.toLong, f.toString, Files.size(f)) }
      }
    import spark.implicits._
    rows.toDF("part", "file_id", "file", "bytes")
  }

  /** Execute ONE partition of a [[graft.operators.Layout.compactionPlan]]:
    * every planned bin's files are rewritten as exactly one file, with
    * [[compact]]'s write-beside-and-swap discipline (a crash at any step
    * leaves a complete copy of the partition live). `plan` must carry
    * (part, file, bin) — the planner output joined back to the manifest's
    * file paths. The driver loop is over BINS of one partition — the
    * rewrite-job orchestration unit (at scale each partition executes
    * independently, one task tree per bin); nothing data-sized ever
    * collects. Returns the achieved file count for the partition, which
    * the caller asserts against the plan's bin count. */
  def executeCompaction(spark: org.apache.spark.sql.SparkSession,
                        dir: String, part: String,
                        plan: DataFrame): Int = {
    import java.nio.file.{Files, Paths}
    import graft.util.Fs.{listDir, rmTree}
    import org.apache.spark.sql.functions.col
    val bins = plan.filter(col("part") === part)
      .select(col("bin").cast("long"), col("file")).collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (bin, rs) => bin -> rs.map(_.getString(1)).sorted }
    require(bins.nonEmpty, s"plan has no files for partition $part")
    val target = Paths.get(dir, part)
    val tmp = Paths.get(dir, part + ".compacting")
    val old = Paths.get(dir, part + ".precompact")
    def achieved(): Int =
      listDir(target).count(_.getFileName.toString.endsWith(".parquet"))
    // interrupted-run recovery, same as compact: restore a stranded
    // original before starting over. One extra state is reachable here
    // that compact never sees: a crash AFTER the tmp→target swap but
    // BEFORE rmTree(old) leaves target holding the compacted copy while
    // the plan's source files are gone (they lived in the pre-swap
    // target). Re-running the bins against those paths would fail
    // midway — detect the completed swap, finish the cleanup, and
    // report the achieved count instead.
    if (Files.exists(old) && !Files.exists(target)) Files.move(old, target)
    else if (Files.exists(old)) {
      val planned = bins.flatMap(_._2)
      if (planned.forall(f => !Files.exists(Paths.get(f)))) {
        rmTree(old)
        return achieved()
      }
      rmTree(old)
    }
    rmTree(tmp)
    bins.foreach { case (_, files) =>
      spark.read.parquet(files: _*).coalesce(1)
        .write.mode("append").parquet(tmp.toString)
    }
    Files.move(target, old)
    Files.move(tmp, target)
    rmTree(old)
    achieved()
  }

  /** K1 — JSON sink (one object per line, the API envelope's rows). */
  def json(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite").json(out)

  /** Parquet sink — the driver contract's canonical output format. */
  def parquet(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite").parquet(out)

  /** Hive-layout partitioned parquet sink — the lake layout that turns a
    * partition-key predicate into directory pruning: a reader filtering on
    * `cols` never lists, opens or scans the other partitions
    * (`PartitionFilters` in the scan, spec-asserted). At 100 TB this is
    * the difference between scanning a day and scanning a decade. */
  def partitionedParquet(df: DataFrame, out: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(out)

  /** K1 — the API envelope (pages/api/etl/restart.js:14-20, users.js:44-46):
    * one JSON object `{users, metrics, fallbackUsed, sourceUrl, fetchedAt}`.
    * Driver-side assembly by design — the envelope is a response payload,
    * not a dataset; `users` is expected to be display-sized (the reference
    * sends its full 500-row page).
    *
    * `maxRows` ENFORCES that contract: the collect is capped at
    * maxRows+1, and finding more than maxRows rows throws rather than
    * silently truncating a payload the caller believed complete — a
    * caller handed a fact table fails fast instead of OOMing the driver. */
  def apiEnvelope(users: DataFrame, metrics: DataFrame,
                  fallbackUsed: Boolean, fetchedAt: java.time.Instant,
                  sourceUrl: String = "", maxRows: Int = 10000): String = {
    val capped = users.limit(maxRows + 1).toJSON.collect()
    if (capped.length > maxRows) throw new IllegalArgumentException(
      s"apiEnvelope: users exceeds maxRows=$maxRows — the envelope is a " +
        "display-sized response payload; aggregate or page the frame first")
    val usersJson = capped.mkString("[", ",", "]")
    val metricsJson = metrics.toJSON.collect().headOption.getOrElse("{}")
    s"""{"users":$usersJson,"metrics":$metricsJson,""" +
      s""""fallbackUsed":$fallbackUsed,"sourceUrl":"${jsonEscape(sourceUrl)}",""" +
      s""""fetchedAt":"$fetchedAt"}"""
  }

  /** K1 error variants (pages/api/etl/restart.js:5-8,22-26): the reference
    * answers 405 `{error: 'Method not allowed'}` to a non-POST and 500
    * `{error: <message>}` when the pipeline throws. Returned as
    * (status, body) so any HTTP layer can relay it. */
  def errorEnvelope(status: Int, message: String): (Int, String) =
    (status, s"""{"error":"${jsonEscape(message)}"}""")

  def methodNotAllowed: (Int, String) = errorEnvelope(405, "Method not allowed")

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** K3 — pretty JSON preview of the first n rows (pages/index.js:268). */
  def previewJson(df: DataFrame, n: Int = 10): Seq[String] =
    df.limit(n).toJSON.collect().toIndexedSeq
}
