package graft

import graft.functions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers the engine's custom Catalyst expressions as
  * SQL functions, so `spark.sql("SELECT cosine_similarity(a, b) ...")` works
  * next to the Scala Column API.
  *
  * Install at build time:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  * or via config: `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.PushableKeyCast)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    e.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
  }
}
