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
  * Merge follows Agarwal et al. (PODS'12, "Mergeable Summaries"): where
  * both sides monitor an item, est/err add pointwise; an item monitored
  * by only ONE side additionally inherits the OTHER side's eviction
  * floor (its minimum counter when at capacity, 0 otherwise) as both
  * count and error — that side may have seen up to floor occurrences of
  * the item before evicting it, so the floor is exactly what preserves
  * `true ≤ est ≤ true + err` across the merge. The combined table then
  * truncates back to the `capacity` largest counters. In the exact
  * regime (never at capacity) both floors are 0 and the merge reduces
  * to the plain pointwise sum.
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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_sketch requires a string item column, got ${other.catalogString}")
    }
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
      if (c < vCount || (c == vCount && (victim == null || item < victim))) {
        victim = item; vCount = c
      }
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

  private def floor(buf: mutable.HashMap[String, (Long, Long)]): Long =
    if (buf.size < capacity) 0L
    else buf.valuesIterator.map(_._1).min

  override def merge(a: mutable.HashMap[String, (Long, Long)],
      b: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    // eviction floors BEFORE mutation: an item absent from a side may
    // have been seen up to floor times there before being evicted
    val fa = floor(a)
    val fb = floor(b)
    val onlyA = a.keysIterator.filterNot(b.contains).toList
    b.foreach { case (item, (c, e)) =>
      a.get(item) match {
        case Some((c0, e0)) => a.update(item, (c0 + c, e0 + e))
        case None => a.update(item, (c + fa, e + fa))
      }
    }
    onlyA.foreach { item =>
      val (c, e) = a(item)
      if (fb > 0) a.update(item, (c + fb, e + fb))
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
      // length-prefixed raw UTF-8, NOT writeUTF: writeUTF caps entries at
      // 64 KiB and this is a general-purpose SQL aggregate — a long item
      // (e.g. a full document string) must round-trip, not kill the stage
      val bytesItem = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytesItem.length)
      out.write(bytesItem)
      out.writeLong(c); out.writeLong(e)
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
      val len = in.readInt()
      val itemBytes = new Array[Byte](len)
      in.readFully(itemBytes)
      val item = new String(itemBytes, java.nio.charset.StandardCharsets.UTF_8)
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

  /** The SQL-registration builder (`topk_sketch(item, k, capacity)`),
    * shared by [[graft.plans.GraftExtensions]] and runtime
    * `ColumnShim.addFunction` callers so both paths enforce the same
    * integer-literal contract for k/capacity.
    */
  def fromChildren(children: Seq[Expression]): SpaceSavingTopK = {
    require(children.length == 3,
      "topk_sketch takes (item, k, capacity) — k and capacity must be integer literals")
    def intLit(e: Expression, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"topk_sketch $name must be an integer literal, got $other")
    }
    SpaceSavingTopK(children.head,
      intLit(children(1), "k"), intLit(children(2), "capacity"))
  }
}
