package graft.etl

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkTestBase {

  test("staged run records real durations, row counts and a log DataFrame") {
    val p = new Pipeline(spark)
    val extracted = p.stage("extract", Tables.customer(spark, sf0001))
    val transformed = p.stage("transform", extracted.filter(col("c_acctbal") > 0))
    p.stage("load", transformed.limit(20))
    assert(p.runs.map(_.stage) == Seq("extract", "transform", "load"))
    assert(p.runs.forall(_.durationSec > 0)) // measured, not the mock 95 s
    assert(p.runs.head.rows >= p.runs(1).rows)
    val log = p.log.collect()
    assert(log.length == 6) // start + done per stage
    assert(log.forall(_.getAs[String]("message").nonEmpty))
  }
}
