package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** KMV / bottom-k sketch (Bar-Yossef et al. RANDOM'02 "Counting distinct
  * elements in a data stream"; Beyer et al. SIGMOD'07 analysis): keep
  * the k SMALLEST distinct hash values seen. The fourth member of the
  * sketch family (Space-Saving heavy hitters, HLL, Count-Min): unlike
  * HLL it is simultaneously a distinct-count estimator
  * (n̂ = (k−1)·2⁶⁰/h₍k₎ over the 60-bit hash space) AND a uniform
  * sample of the distinct VALUES — the sample HLL registers cannot give
  * back — which is what makes bottom-k the sketch of choice for
  * distinct-heavy joins and set-resemblance estimates.
  *
  * Determinism: the bottom-k of a distinct hash set is a unique set (no
  * ties between distinct longs), so the output — the sorted-ascending
  * hash array — is exactly reproducible, and when a group has fewer
  * than k distinct hashes the sketch degenerates to the EXACT distinct
  * set (the regime where the estimator is replaced by the exact size).
  *
  * Scale: O(k) state per group regardless of input rows or distinct
  * cardinality; partials combine map-side (merge = union + truncate),
  * so a wide scan ships one k-long array per partition per group.
  */
case class KmvBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottomk_sketch requires a long hash column, got ${other.catalogString}")
    }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit = {
    if (buf.size < k) buf += v
    else if (v < buf.last) { buf += v; if (buf.size > k) buf -= buf.last }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach(add(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Long].map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvBottomK =
    copy(child = newChildren.head)

  override def prettyName: String = "bottomk_sketch"
}

object KmvBottomK {
  /** Column-API form: `bottomk(hashCol, k = 32)`. */
  def bottomk(item: Column, k: Int): Column =
    ColumnShim.column(KmvBottomK(ColumnShim.expression(item), k)
      .toAggregateExpression())

  /** SQL-registration builder (`bottomk_sketch(hash, k)`). */
  def fromChildren(children: Seq[Expression]): KmvBottomK = {
    require(children.length == 2,
      "bottomk_sketch takes (hash, k) — k must be an integer literal")
    val k = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"bottomk_sketch k must be an integer literal, got $other")
    }
    KmvBottomK(children.head, k)
  }
}
