package graft.etl

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkTestBase {

  test("salted join equals the plain join on skewed fixture data") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_suppkey", "l_quantity")
    val sup = Tables.supplier(spark, sf0001) // 10 suppliers → every key is hot
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val salted = Transform.saltedJoin(li, sup, "l_suppkey", "s_suppkey", salts = 8)
      .groupBy("s_name").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    assertSameRows(plain, salted)
  }

  test("salting actually spreads a hot key over multiple salts") {
    import spark.implicits._
    val hot = Seq.fill(1000)(1L).toDF("k")
    val salted = hot.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
    assert(salted.select("_salt").distinct().count() >= 4)
  }
}
