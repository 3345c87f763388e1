package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per key as a single operator — the engine's demonstration
  * of the FULL custom-operator extension path (builder brief (c):
  * logical node + `SparkStrategy` + physical `SparkPlan`).
  *
  * Why a custom operator: Spark's idiom for "k best rows per key" is a
  * `row_number` window + filter, which SORTS every shuffle partition in
  * full before discarding all but k rows per key. This operator instead
  * keeps a bounded heap per key: a PARTIAL pass caps each map partition
  * at k rows per key (so the shuffle moves at most
  * k·|keys-per-partition| rows — the per-key analogue of
  * `TakeOrderedAndProject`'s partial top-k), then a FINAL pass after the
  * key shuffle merges the partials. No full sort anywhere; memory is
  * O(distinct keys in partition × k).
  *
  * Semantics: for each distinct key, the first k rows of the child in
  * `order`; callers make `order` a total order (include a tiebreak) for
  * determinism. Output order is unspecified (sorted within key) — order
  * the result explicitly for display.
  */
final case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial-then-final [[TopKPerKeyExec]]; the
  * final node's required distribution makes `EnsureRequirements` insert
  * the key shuffle between the two.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val schema = child.output
    val keyExprs = keys
    val sortOrder = order
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord = RowOrdering.create(sortOrder, schema)
      // max-heap by sort position: the head is the WORST kept row, so a
      // better incoming row evicts it in O(log k)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      // emit best-first within each key (dequeueAll yields worst-first)
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
