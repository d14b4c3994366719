package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: HOF-based vs window-lead shingle construction cost. */
object ProfileShingles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def hof(n: Int) = operators.Dedup.shingles(docs, n)
      .select(col("doc_id"), explode(col("shingles")).as("sg"))
    def windowed(n: Int) = {
      val toks = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val shingled = toks.select(col("doc_id"), col("pos"),
        concat_ws(" ", (0 until n).map(i =>
          if (i == 0) col("tok") else lead(col("tok"), i).over(w)): _*).as("sg"),
        lead(col("tok"), n - 1).over(w).as("guard"))
      shingled.filter(col("guard").isNotNull).select(col("doc_id"), col("sg")).distinct()
    }
    // warm both
    hof(5).write.format("noop").mode("overwrite").save()
    windowed(5).write.format("noop").mode("overwrite").save()
    t("hof_1")(hof(5).count()); t("hof_2")(hof(5).count())
    t("win_1")(windowed(5).count()); t("win_2")(windowed(5).count())
    spark.stop()
  }
}
