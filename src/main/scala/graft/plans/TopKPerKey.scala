package graft.plans

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode, UnsafeKVExternalSorter}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame}

import scala.jdk.CollectionConverters._

/** Top-k rows per key as a first-class physical operator — the full custom
  * ladder rung: LogicalPlan node → planner Strategy → SparkPlan.
  *
  * Why it exists: the declarative formulation
  * (`row_number().over(partitionBy(key).orderBy(ord)) <= k`) must SORT every
  * partition in full before discarding all but k rows. This operator keeps a
  * bounded k-heap per key instead — O(n log k) with no sort buffer, and the
  * per-partition output shrinks to ≤ k·keys rows. At 100 TB with k=3 that is
  * the difference between sorting the dataset and streaming over it.
  *
  * The exec declares `ClusteredDistribution(keys)`, so Spark inserts the
  * hash exchange (and ONLY that) beneath it — the shuffle plan is identical
  * to the window version minus the sort.
  *
  * Memory safety: the heap map holds k rows PER DISTINCT KEY, so its
  * footprint is data-dependent. Inserted bytes are tracked against
  * `spark.graft.topk.maxMemoryBytes` (default 64 MB); when a partition's
  * keys exceed the budget the operator switches to sort-based execution —
  * the partial heaps plus the remaining input go through Spark's
  * [[UnsafeKVExternalSorter]] (the same spill machinery HashAggregateExec
  * falls back to), and the k-heap then runs over each key's group in the
  * spilled-and-merged stream, O(k) resident rows at a time. Results are
  * identical on both paths (the heaps hold a superset of each key's top-k
  * at the moment of conversion).
  */
final case class TopKPerKeyNode(
    keys: Seq[Expression], ordering: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, child) =>
      TopKPerKeyExec(keys, ordering, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression], ordering: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  // deliberately NO requiredChildOrdering — the heap replaces the sort

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = ordering
    val childOutput = child.output
    val limit = k
    val maxMemoryBytes = conf.getConfString(
      "spark.graft.topk.maxMemoryBytes", (64L * 1024 * 1024).toString).toLong
    val keySchema = StructType(keyExprs.zipWithIndex.map { case (e, i) =>
      StructField(s"k_$i", e.dataType, e.nullable)
    })
    val valueSchema = StructType(childOutput.map(a =>
      StructField(a.name, a.dataType, a.nullable)))

    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection: child plans may emit non-unsafe rows
      // (columnar-to-row, some non-codegen paths) — never cast blindly
      val rowProj = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      val ord = RowOrdering.create(sortOrder, childOutput) // best row sorts first
      val worstFirst = ord.reverse

      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      var usedBytes = 0L
      var overBudget = false

      def insert(heap: java.util.PriorityQueue[UnsafeRow], row: UnsafeRow): Unit =
        if (heap.size < limit) {
          val kept = row.copy(); usedBytes += kept.getSizeInBytes; heap.add(kept)
        } else if (ord.compare(row, heap.peek()) < 0) {
          usedBytes -= heap.poll().getSizeInBytes
          val kept = row.copy(); usedBytes += kept.getSizeInBytes; heap.add(kept)
        }

      while (iter.hasNext && !overBudget) {
        val row = rowProj(iter.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, worstFirst)
          val keyCopy = key.copy()
          usedBytes += keyCopy.getSizeInBytes + 64 // entry overhead estimate
          heaps.put(keyCopy, heap)
        }
        insert(heap, row)
        overBudget = usedBytes > maxMemoryBytes
      }

      if (!overBudget) {
        // fast path: everything fit — stream the heaps out
        heaps.values().asScala.iterator.flatMap { h =>
          h.asScala.toIndexedSeq.sorted(ord).iterator
        }
      } else {
        // sort-based fallback (the HashAggregateExec pattern): partial heaps
        // are a per-key superset of the final top-k for the consumed prefix,
        // so (heaps ++ rest of input) sorted by key and re-topped is exact.
        val sorter = new UnsafeKVExternalSorter(
          keySchema, valueSchema,
          SparkEnv.get.blockManager, SparkEnv.get.serializerManager,
          4L * 1024 * 1024 /* pageSizeBytes */,
          4096 /* initial sort buffer entries */,
          Int.MaxValue.toLong /* force-spill row threshold: size-managed */)
        // register cleanup BEFORE inserting: an insertKV failure (spill
        // IOException, OOM) must not orphan the sorter's spill files
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => sorter.cleanupResources()))
        val it = heaps.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val hIt = e.getValue.iterator()
          while (hIt.hasNext) sorter.insertKV(e.getKey, hIt.next())
        }
        heaps.clear()
        while (iter.hasNext) {
          val row = rowProj(iter.next())
          sorter.insertKV(keyProj(row), row)
        }
        val sorted = sorter.sortedIterator()
        new Iterator[InternalRow] {
          // lookahead protocol: `positioned` ⇔ `sorted` sits on the first
          // unconsumed KV pair (the head of the next key group)
          private var positioned = sorted.next()
          private val heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, worstFirst)
          private var drained: Iterator[UnsafeRow] = Iterator.empty

          private def topUp(row: UnsafeRow): Unit =
            if (heap.size < limit) heap.add(row.copy())
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll(); heap.add(row.copy())
            }

          /** Consume one whole key group (equal keys are adjacent in the
            * sorter's key order) into the k-heap, then drain it sorted. */
          private def loadGroup(): Unit = {
            heap.clear()
            val groupKey = sorted.getKey.copy()
            topUp(sorted.getValue)
            var more = sorted.next()
            while (more && sorted.getKey == groupKey) {
              topUp(sorted.getValue)
              more = sorted.next()
            }
            positioned = more
            drained = heap.asScala.toIndexedSeq.sorted(ord).iterator
          }

          override def hasNext: Boolean =
            drained.hasNext || { if (positioned) { loadGroup(); drained.hasNext } else false }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            drained.next()
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  /** Public API: top `k` rows per `keys` group, ordered by
    * `(column, ascending)` pairs — make the order total for deterministic
    * results. Attributes are resolved here against the analyzed child (the
    * analyzer does not resolve expressions inside foreign plan nodes).
    * Requires [[TopKPerKeyStrategy]] on the session (GraftExtensions or
    * `spark.experimental.extraStrategies`). */
  def apply(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val plan = Bridge.logicalPlan(df)
    def attr(n: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${plan.output.map(_.name)}"))
    val sortExprs = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    Bridge.ofRows(df.sparkSession, TopKPerKeyNode(keys.map(attr), sortExprs, k, plan))
  }
}
