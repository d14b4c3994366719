package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min sketch MERGE + ESTIMATE — the two pieces Spark does not ship.
  *
  * Spark's native `count_min_sketch(col, eps, confidence, seed)` aggregate
  * builds a serialized [[org.apache.spark.util.sketch.CountMinSketch]] per
  * group (codegen-planned, map-side partial merge) but offers no SQL-level
  * way to UNION those blobs to a coarser grain or to query a count back out.
  * These two expressions close that gap, so frequency rollups follow the
  * same touch-the-data-once shape as the HLL/KLL rollups
  * ([[graft.operators.Sketches]]): one fixed-size sketch per fine group,
  * coarser grains merge `depth×width` counter tables (bytes, not data),
  * and "how often did item X appear" is answered from the merged sketch
  * without rescanning the fact table.
  *
  * Guarantees (Cormode–Muthukrishnan 2005): estimate ≥ true count always
  * (hash collisions only ADD), and estimate ≤ true + ε·N with probability
  * ≥ 1−δ, at width ⌈e/ε⌉ and depth ⌈ln(1/δ)⌉. Merge is exact: the counter
  * tables add cell-wise, so a merged sketch equals the sketch of the
  * concatenated streams (same ε/δ/seed required — enforced loudly).
  */
object CmsExpressions {
  /** Mutable union buffer: `null` until the first blob arrives (the
    * sketch's shape — depth/width/seed — is only known from the data). */
  final class UnionBuffer(var sk: CountMinSketch)
}

/** Union of serialized Count-Min sketches (the rollup step). Input rows are
  * sketch blobs from a finer grain. Incompatible shapes (different ε/δ/seed)
  * fail the task loudly — sketch state is engine-internal, a mismatch is a
  * bug, not data. Null over an all-null/empty group. */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsExpressions.UnionBuffer] {

  override def createAggregationBuffer(): CmsExpressions.UnionBuffer =
    new CmsExpressions.UnionBuffer(null)

  private def fold(buf: CmsExpressions.UnionBuffer,
                   sk: CountMinSketch): CmsExpressions.UnionBuffer = {
    if (buf.sk == null) buf.sk = sk else buf.sk.mergeInPlace(sk)
    buf
  }

  override def update(buf: CmsExpressions.UnionBuffer,
                      input: InternalRow): CmsExpressions.UnionBuffer = {
    val v = child.eval(input)
    if (v == null) buf
    else fold(buf, CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: CmsExpressions.UnionBuffer,
                     other: CmsExpressions.UnionBuffer): CmsExpressions.UnionBuffer =
    if (other.sk == null) buf else fold(buf, other.sk)

  override def eval(buf: CmsExpressions.UnionBuffer): Any =
    if (buf.sk == null) null else buf.sk.toByteArray

  override def serialize(buf: CmsExpressions.UnionBuffer): Array[Byte] =
    if (buf.sk == null) Array.emptyByteArray else buf.sk.toByteArray
  override def deserialize(bytes: Array[Byte]): CmsExpressions.UnionBuffer =
    new CmsExpressions.UnionBuffer(
      if (bytes.isEmpty) null else CountMinSketch.readFrom(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_merge_agg"
  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = c.head)
}

/** Frequency estimate of `item` from a serialized Count-Min sketch. Items
  * hash exactly as Spark's native `count_min_sketch` aggregate added them
  * (longs via the long path, strings via their UTF-8 bytes), so estimates
  * are read-your-writes consistent with the native build side. Scalar,
  * evaluated once per PROBE row (a top-k list or a groups table), never on
  * the fact stream — CodegenFallback costs nothing measurable there. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val sk = CountMinSketch.readFrom(sketchBytes.asInstanceOf[Array[Byte]])
    right.dataType match {
      case LongType => sk.estimateCount(item.asInstanceOf[Long])
      case StringType => sk.estimateCount(item.asInstanceOf[UTF8String].getBytes)
      case t => throw new IllegalArgumentException(
        s"cms_estimate: unsupported item type $t (long or string)")
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
}
