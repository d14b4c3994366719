package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.execution.SparkStrategy
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
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput) // best row sorts first
      val worstFirst = ord.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.values().asScala.iterator.flatMap { h =>
        h.asScala.toIndexedSeq.sorted(ord).iterator
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
