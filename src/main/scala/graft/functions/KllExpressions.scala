package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketches as first-class mergeable aggregation state — the
  * percentile twin of the HLL distinct-count rollup
  * ([[graft.operators.Sketches]]).
  *
  * Why a sketch and not `percentile()`: exact percentiles need the value
  * stream at every grain — each rollup level is another shuffle of the
  * data. A KLL sketch is a fixed-size (~3KB at k=200) mergeable summary
  * with a PROVEN normalized-rank-error bound (~1.65% at k=200, 99%
  * confidence; Karnin–Lang–Liberty, FOCS 2016): build once per fine group,
  * then every coarser grain is a merge of |groups| sketch blobs — bytes,
  * not data. That is the only percentile-dashboard shape that survives
  * 100 TB.
  *
  * Three pieces, mirroring the DataSketches HLL trio Spark ships natively:
  *   - [[KllBuildAgg]]   (`kll_sketch_agg`):  doubles → sketch bytes
  *   - [[KllMergeAgg]]   (`kll_merge_agg`):   sketch bytes → merged bytes
  *   - [[KllQuantileOf]] (`kll_quantile`):    sketch bytes × rank → value
  *
  * `TypedImperativeAggregate` is the Catalyst contract for arbitrary-object
  * aggregation state: partial (map-side) update on executors, compact
  * binary shuffle via serialize/deserialize, streaming-compatible merge.
  */
case class KllBuildAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_sketch_agg"
  override def withNewMutableAggBufferOffset(o: Int): KllBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllBuildAgg =
    copy(child = c.head)
}

/** Union of serialized KLL sketches (the rollup step): input rows are
  * sketch blobs from a finer grain; the merge result carries the combined
  * error bound of its inputs. An unparseable blob fails the task loudly —
  * sketch state is engine-internal, corruption is a bug, not data. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  // k of the accumulator adapts on first merge: KLL merge keeps the
  // smaller k of the two operands, so seeding with the max k is neutral
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(org.apache.datasketches.kll.KllSketch.MAX_K)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_merge_agg"
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = c.head)
}

/** Quantile extraction from a serialized KLL sketch (INCLUSIVE search: the
  * returned value's inclusive rank is ≥ the requested rank — the convention
  * whose observed rank is measured with `value <= estimate`). Null for an
  * empty sketch. Scalar, evaluated once per GROUP row (the |groups|-sized
  * result of the rollup), so CodegenFallback costs nothing measurable. */
case class KllQuantileOf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  // null for an EMPTY sketch even when both children are non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sketchBytes: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(rank.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantileOf = copy(left = l, right = r)
}
