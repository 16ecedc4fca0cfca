package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a first-class operator — the (c)-tier custom
  * operator path: LogicalPlan node + SparkStrategy + SparkPlan,
  * registered through SparkSessionExtensions (GraftExtensions) or
  * spark.experimental.extraStrategies (GraftOps ensures it).
  *
  * Spark's native formulation (row_number window + filter) SORTS every
  * group in full: O(n log n) per partition plus a sort buffer
  * proportional to the partition. This operator keeps a bounded k-heap
  * per group: O(n log k) time, O(groups*k) memory, no sort at all —
  * the difference between "spills at 100 TB" and "streams at 100 TB"
  * for small k. The required ClusteredDistribution on the group keys
  * makes Catalyst insert (and AQE tune) the one hash shuffle it needs.
  */
final case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val groupExprsLocal = groupExprs
    val orderingLocal = ordering
    val kLocal = k
    child.execute().mapPartitions(
      { iter =>
        val keyProj = UnsafeProjection.create(groupExprsLocal, schema)
        val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(orderingLocal, schema)
        // max-heap on the sort order: head = worst row currently kept
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        iter.foreach { row =>
          val key = keyProj(row)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              val h = mutable.PriorityQueue.empty[InternalRow](ord)
              heaps.put(key.copy(), h)
              h
          }
          if (heap.size < kLocal) heap.enqueue(row.copy())
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(row.copy())
          }
        }
        heaps.iterator.flatMap { case (_, heap) => heap.toArray.sorted(ord).iterator }
      },
      preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) => TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
