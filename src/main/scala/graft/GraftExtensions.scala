package graft

import graft.functions.{CosineSimilarity, DotProduct, HyperplaneSignature, L2NormalizeRounded, QuantizeInt8, RollingHash, ShingleHashes}
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
    // int parameters arrive as literal expressions from SQL — fold them here
    def intArg(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    e.injectFunction((FunctionIdentifier("hyperplane_signature"),
      info("hyperplane_signature",
        "hyperplane_signature(vec, planes, dim[, table]) - sign-LSH signature of a float array"),
      (args: Seq[Expression]) => HyperplaneSignature(args(0), intArg(args(1)),
        intArg(args(2)), if (args.length > 3) intArg(args(3)) else 0)))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(text, n) - xxhash64 of every n-token shingle"),
      (args: Seq[Expression]) => ShingleHashes(args(0), intArg(args(1)))))
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) - base-31 polynomial codepoint hash"),
      (args: Seq[Expression]) => RollingHash(args(0))))
    e.injectFunction((FunctionIdentifier("l2_normalize"),
      info("l2_normalize",
        "l2_normalize(vec[, scale]) - unit vector, elements rounded to scale decimals"),
      (args: Seq[Expression]) => L2NormalizeRounded(args(0),
        if (args.length > 1) intArg(args(1)) else 6)))
    e.injectFunction((FunctionIdentifier("quantize_int8"),
      info("quantize_int8", "quantize_int8(vec) - symmetric max-abs/127 int8 quantization"),
      (args: Seq[Expression]) => QuantizeInt8(args(0))))
    e.injectFunction((FunctionIdentifier("cms_merge_agg"),
      info("cms_merge_agg",
        "cms_merge_agg(sketch) - union of serialized Count-Min sketch blobs"),
      (args: Seq[Expression]) =>
        graft.functions.CmsMergeAgg(args(0)).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("cms_estimate"),
      info("cms_estimate",
        "cms_estimate(sketch, item) - frequency estimate of item from a Count-Min sketch"),
      (args: Seq[Expression]) => graft.functions.CmsEstimate(args(0), args(1))))
  }
}
