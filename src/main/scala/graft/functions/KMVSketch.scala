package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded k-minimum-values buffer: the k smallest DISTINCT hash values
  * seen. Losslessly mergeable (union-then-truncate), so Spark plans a
  * map-side partial aggregate and each task ships at most k longs —
  * the classic KMV distinct-count sketch (Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream"): with uniform hashes
  * on [0, M), E[distinct] ≈ (k-1) * M / kth_min.
  *
  * Unlike HLL (engine-specific register layout), the k minima of a
  * portable hash are a *deterministic function of the input set* — any
  * engine replays them with ORDER BY hash LIMIT k, which is what makes
  * the q74 estimate DuckDB-oracle-checkable bit-for-bit.
  */
final class KMVBuffer(val k: Int) extends Serializable {
  val set = new java.util.TreeSet[java.lang.Long]()

  def insert(h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    else if (h < set.last()) {
      // add() is false on a duplicate — only evict when a new value landed
      if (set.add(h)) { set.pollLast(); () }
    }

  def mergeFrom(other: KMVBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next())
  }

  /** Ascending minima; last element is the k-th smallest once saturated. */
  def result(): Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** kmv_mins(hash, k) -> array<bigint>: the k smallest distinct hash
  * values, ascending.
  */
case class KMVMins(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KMVBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KMVBuffer = new KMVBuffer(k)

  override def update(buf: KMVBuffer, row: InternalRow): KMVBuffer = {
    val h = child.eval(row)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KMVBuffer, other: KMVBuffer): KMVBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: KMVBuffer): Any = new GenericArrayData(buf.result())

  override def serialize(buf: KMVBuffer): Array[Byte] = {
    val vals = buf.result()
    val bb = ByteBuffer.allocate(8 + 8 * vals.length)
    bb.putInt(buf.k).putInt(vals.length)
    vals.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KMVBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KMVBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KMVMins =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMVMins =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KMVMins = copy(child = cs(0))
  override def prettyName: String = "kmv_mins"
}

object KMVSketch {
  def kmvMins(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KMVMins(ColumnBridge.expression(hash), k).toAggregateExpression())
}
