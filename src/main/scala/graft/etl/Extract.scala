package graft.etl

import graft.Tables
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.util.{Failure, Success, Try}

/** Extract-stage sources (SURVEY.md §2.1).
  *
  * The reference pulls JSON over HTTP with per-source failure isolation and
  * bundled fallback datasets (users.js:1-63, spacex.js:1-65). Here every
  * source is a Spark scan; HTTP is modeled as "path that may not exist".
  * At cluster scale a live HTTP source would be a DataSource V2
  * `TableProvider` fetching on the driver and parallelizing by page — out of
  * scope for the fixtures, the isolation/fallback semantics are what carry.
  */
object Extract {

  /** S1 — single source scan with explicit read schema. */
  def source(spark: SparkSession, sfDir: String, table: String): DataFrame =
    Tables(spark, sfDir, table)

  /** S2 — parallel multi-endpoint extract with per-endpoint error isolation:
    * a failing source degrades to an empty DataFrame of the expected schema
    * instead of failing the run (spacex.js:7-13: `catch → []`). */
  def sourcesIsolated(spark: SparkSession, sfDir: String,
                      tables: Seq[(String, StructType)]): Map[String, DataFrame] =
    tables.map { case (name, schema) =>
      name -> (Try(Tables(spark, sfDir, name)) match {
        case Success(df) => df
        case Failure(_)  => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      })
    }.toMap

  /** J4/E4 — point lookup with a multi-level source fallback chain
    * (pages/launch/[id].js:31-64: loaded set → direct fetch → fallback set;
    * miss everywhere → empty = the page's `notFound` terminal). */
  def pointWithFallback(keyCol: String, key: String,
                        sources: Seq[DataFrame]): DataFrame = {
    val hits = sources.iterator
      .map(df => Transform.pointLookup(df, keyCol, key))
      .find(!_.isEmpty)
    hits.getOrElse(Transform.pointLookup(sources.last, keyCol, key))
  }

  /** S3/S4 — literal fallback datasets (users.js:81-111, spacex.js:82-115):
    * the mock metrics row that stands in when a source yields zero rows. */
  def fallbackMetrics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1240L, 1210L, 30L, 0L, "fallback"))
      .toDF("rows_in", "rows_out", "dedup_removed", "countries", "last_record")
  }
}
