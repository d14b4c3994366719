package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the dedup pipelines (dev-only). */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val sh5 = Dedup.shingles(docs, 5)
    t("sh5_explode") {
      sh5.select(col("doc_id"), explode(col("shingles")).as("sg")).count()
    }
    val inv = sh5.select(col("doc_id"), size(col("shingles")).as("n_sh"),
      explode(col("shingles")).as("sg"))
    t("inv_selfjoin") {
      val a = inv.alias("a"); val b = inv.alias("b")
      a.join(b, col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id")).count()
    }
    t("d4_full")(Dedup.ngramJaccardPairs(docs).count())
    t("d4_full_again")(Dedup.ngramJaccardPairs(docs).count())
    spark.stop()
  }
}
