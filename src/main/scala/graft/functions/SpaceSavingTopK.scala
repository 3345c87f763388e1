package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters sketch (Metwally, Agrawal & El Abbadi,
  * ICDT'05 "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams") as a [[TypedImperativeAggregate]] — the engine's
  * demonstration of the BINARY-STATE mergeable-sketch aggregate surface
  * (the plumbing every production sketch — HLL, KLL, theta — rides on):
  * an arbitrary JVM object as aggregation state, explicit
  * serialize/deserialize for shuffle-exchange of partial states, and a
  * partial/merge plan identical to built-in aggregates.
  *
  * Semantics: at most `capacity` counters are kept. A monitored item's
  * count increments exactly; an unmonitored item EVICTS the current
  * minimum counter (deterministic tie-break: smallest (count, item)) and
  * inherits its count as `max_err` — the classic guarantee
  * `true_count ≤ est_count ≤ true_count + max_err`, with total error
  * bounded by N/capacity. When `capacity` ≥ the number of distinct items
  * no eviction ever fires, every `max_err` is 0, and the sketch is EXACT
  * — the regime the correctness gate runs it in (the DuckDB oracle is a
  * plain exact GROUP BY count), while the same plan at 100 TB caps state
  * at `capacity` counters per group no matter how large the key space.
  *
  * Merge is the pointwise-sum merge of Agarwal et al. (PODS'12,
  * "Mergeable Summaries"): est/err add where both sides monitor the item,
  * then the combined table truncates back to the `capacity` largest
  * counters. Associative and commutative, so Spark may combine partial
  * states in any order — required of every aggregate buffer.
  *
  * Output: array<struct<item, est_count, max_err>> sorted by
  * (est_count desc, item asc), truncated to `k` — deterministic for the
  * exact regime; callers `posexplode` it into ranked rows.
  *
  * Scale: per-group state is O(capacity) regardless of input rows — the
  * whole point vs an exact `GROUP BY item` whose state is O(distinct
  * items). Partials combine map-side, so a 1000-executor scan ships one
  * `capacity`-entry sketch per partition per group, never raw items.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(k > 0, "k must be positive")
  require(capacity >= k, "capacity must be >= k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def evictMin(buf: mutable.HashMap[String, (Long, Long)]): (String, Long) = {
    // deterministic victim: smallest (count, item) — iteration order of a
    // HashMap is arbitrary, so compare on the pair, never "first found"
    var victim: String = null
    var vCount = Long.MaxValue
    buf.foreach { case (item, (c, _)) =>
      if (c < vCount || (c == vCount && item < victim)) { victim = item; vCount = c }
    }
    buf.remove(victim)
    (victim, vCount)
  }

  override def update(buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some((c, e)) => buf.update(item, (c + 1, e))
        case None if buf.size < capacity => buf.update(item, (1L, 0L))
        case None =>
          val (_, minCount) = evictMin(buf)
          buf.update(item, (minCount + 1, minCount))
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, (Long, Long)],
      b: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    b.foreach { case (item, (c, e)) =>
      a.get(item) match {
        case Some((c0, e0)) => a.update(item, (c0 + c, e0 + e))
        case None => a.update(item, (c, e))
      }
    }
    if (a.size > capacity) {
      // truncate to the capacity largest (count desc, item asc) counters
      val keep = a.toSeq.sortBy { case (item, (c, _)) => (-c, item) }
        .take(capacity).map(_._1).toSet
      a.filterInPlace { case (item, _) => keep.contains(item) }
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq.sortBy { case (item, (c, _)) => (-c, item) }.take(k)
    new GenericArrayData(top.map { case (item, (c, e)) =>
      InternalRow(UTF8String.fromString(item), c, e)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, (c, e)) =>
      out.writeUTF(item); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val item = in.readUTF()
      buf.update(item, (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)

  override def prettyName: String = "topk_sketch"
}

object SpaceSavingTopK {
  /** Column-API form: `topk(col("word"), k = 5, capacity = 1024)`. */
  def topk(item: Column, k: Int, capacity: Int): Column =
    ColumnShim.column(SpaceSavingTopK(ColumnShim.expression(item), k, capacity)
      .toAggregateExpression())
}
