package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch counter matrix (Cormode & Muthukrishnan 2005,
  * "An improved data stream summary: the count-min sketch and its
  * applications"): d rows of w counters; an item increments one cell
  * per row at ((a_j * h + b_j) mod P) mod w, and a point query reads
  * the MIN over its d cells — an overestimate by at most the hash
  * collisions, never an underestimate.
  *
  * Counter matrices are entrywise-additive, so the aggregate is
  * losslessly mergeable: Spark plans a map-side partial and each task
  * ships exactly d*w longs regardless of input size — the bounded-state
  * frequency twin of KMV's distinct-count buffer (q74) and the
  * one-shot alternative to Misra-Gries' two-pass exact recount (q75).
  * The row hashes are affine transforms of a PORTABLE item hash, so the
  * whole matrix is a deterministic function of the input multiset that
  * DuckDB replays with a GROUP BY per row — full-oracle-checkable,
  * unlike engine-internal CountMinSketch implementations.
  */
final class CmsBuffer(val d: Int, val w: Int) extends Serializable {
  val counters = new Array[Long](d * w)

  def insert(h: Long): Unit = {
    var j = 0
    while (j < d) {
      counters(j * w + CmsSketch.cell(h, j, w)) += 1L
      j += 1
    }
  }

  def mergeFrom(other: CmsBuffer): Unit = {
    var i = 0
    while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
  }
}

/** cms_counters(hash, d, w) -> array<bigint> of length d*w (row-major
  * counter matrix).
  */
case class CmsCounters(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(d, w)

  override def update(buf: CmsBuffer, row: InternalRow): CmsBuffer = {
    val h = child.eval(row)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: CmsBuffer): Any = new GenericArrayData(buf.counters)

  override def serialize(buf: CmsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.counters.length)
    bb.putInt(buf.d).putInt(buf.w)
    buf.counters.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CmsBuffer(bb.getInt(), bb.getInt())
    var i = 0
    while (i < buf.counters.length) { buf.counters(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsCounters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsCounters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CmsCounters = copy(child = cs(0))
  override def prettyName: String = "cms_counters"
}

object CmsSketch {
  /** Row-hash constants: affine transforms mod 1e9+7 with per-row
    * coefficients — replayable as BIGINT arithmetic in any engine.
    */
  final val P = TextHash.Mod
  final val RowA = 982451653L
  final val RowStep = 7919L
  final val RowB = 12345L

  def rowA(j: Int): Long = RowA + j * RowStep

  /** The cell index of item-hash `h` in row `j`. The hash is first
    * reduced into [0, P) with floorMod so that arbitrary bigint input
    * (the SQL surface accepts any column) can neither overflow
    * rowA(j)*h nor produce a negative cell index; for hashes already
    * in [0, P) — all registered queries — the reduction is identity,
    * so oracle replays are unchanged.
    */
  def cell(h: Long, j: Int, w: Int): Int = {
    val hm = Math.floorMod(h, P)
    (((rowA(j) * hm + RowB) % P) % w).toInt
  }

  def cmsCounters(hash: Column, d: Int, w: Int): Column =
    ColumnBridge.column(
      CmsCounters(ColumnBridge.expression(hash), d, w).toAggregateExpression())
}
