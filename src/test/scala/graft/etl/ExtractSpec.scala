package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.types._

class ExtractSpec extends SparkTestBase {

  private val userSchema = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType)))

  test("S2 per-source failure isolation: missing source degrades to empty") {
    val sources = Extract.sourcesIsolated(spark, sf0001, Seq(
      "customer" -> userSchema,            // exists → real scan
      "no_such_table" -> userSchema))      // missing → empty with schema
    assert(sources("customer").count() > 0)
    val degraded = sources("no_such_table")
    assert(degraded.isEmpty)
    assert(degraded.schema == userSchema) // downstream plan still resolves
  }
}
