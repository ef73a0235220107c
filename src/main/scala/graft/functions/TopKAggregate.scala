package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded top-k buffer: keeps the k largest (ord, payload) pairs seen.
  * A plain binary min-heap on ord — O(log k) insert once full, O(k)
  * space, losslessly mergeable, so Spark plans a partial aggregate
  * before the shuffle: each map task ships at most k rows per group
  * instead of the whole group (a per-group window sort ships and sorts
  * everything).
  */
final class TopKBuffer(val k: Int) extends Serializable {
  var size = 0
  val ords = new Array[Long](k)
  val payloads = new Array[Long](k)

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && ords(i) < ords((i - 1) / 2)) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }
  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val (l, r) = (2 * i + 1, 2 * i + 2)
      var m = i
      if (l < size && ords(l) < ords(m)) m = l
      if (r < size && ords(r) < ords(m)) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }
  private def swap(i: Int, j: Int): Unit = {
    val to = ords(i); ords(i) = ords(j); ords(j) = to
    val tp = payloads(i); payloads(i) = payloads(j); payloads(j) = tp
  }

  def insert(ord: Long, payload: Long): Unit =
    if (size < k) {
      ords(size) = ord; payloads(size) = payload; size += 1
      siftUp(size - 1)
    } else if (ord > ords(0)) {
      ords(0) = ord; payloads(0) = payload
      siftDown()
    }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.ords(i), other.payloads(i)); i += 1 }
  }

  /** payloads ordered by ord descending. */
  def result(): Array[Long] =
    (0 until size).map(i => (ords(i), payloads(i))).sortBy(-_._1)
      .map(_._2).toArray
}

/** top_k_by(payload, ord, k) -> array<bigint>: the payloads of the k
  * rows with the largest ord, in descending ord order. ord must totally
  * order rows (e.g. an exact combined key) for deterministic output.
  */
case class TopKBy(
    payload: Expression,
    ord: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(payload, ord)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer,
                      row: org.apache.spark.sql.catalyst.InternalRow): TopKBuffer = {
    val p = payload.eval(row)
    val o = ord.eval(row)
    if (p != null && o != null)
      buf.insert(o.asInstanceOf[Long], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = new GenericArrayData(buf.result())

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ords(i)); bb.putLong(buf.payloads(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { val o = bb.getLong(); val p = bb.getLong(); buf.insert(o, p); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKBy =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKBy =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKBy = copy(payload = cs(0), ord = cs(1))
  override def prettyName: String = "top_k_by"
}

object TopKBy {
  def topKBy(payload: Column, ord: Column, k: Int): Column =
    ColumnBridge.column(
      TopKBy(ColumnBridge.expression(payload), ColumnBridge.expression(ord), k)
        .toAggregateExpression())
}
