package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** PORTABLE HyperLogLog register sketch (Flajolet et al. 2007,
  * "HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm"): m registers, each holding the maximum leading-zero rank
  * ρ(w) seen among the hashes routed to it. Registers merge by
  * entrywise MAX — losslessly mergeable bounded state, the third
  * sketch-family member next to KMV's k minima (q74) and CMS's counter
  * matrix (q108): m longs per task regardless of input size.
  *
  * What distinguishes this from every engine-internal HLL (including
  * Spark's `approx_count_distinct`, the retired q28): the hash is the
  * portable dual affine transform of the key (constants shared with the
  * KMV/CMS oracles), the register index is `pack mod m`, and the rank
  * is the integer `ρ = wBits − floor(log2(w)) (w > 0)` over the
  * remaining bits — every step is plain integer arithmetic a DuckDB
  * oracle replays register for register, so the APPROXIMATE result is
  * deterministic and hash-checkable (q124), exactly like KMV's minima.
  *
  * Register layout for m = 256 (p = 8): pack < 2^60 (two base-(1e9+7)
  * hashes packed at 2^30), idx = pack mod 256, w = pack div 256 <
  * 2^52, ρ ∈ [1, 52] with ρ = 53 for w = 0; register value 0 = empty.
  * The raw estimate is `alpha_m · m² / Σ 2^−M_j`, computed from the
  * exact integer `S = Σ 2^(53 − M_j)` so both engines divide the same
  * two exact numbers.
  */
final class HllBuffer(val m: Int) extends Serializable {
  val regs = new Array[Long](m)

  def insert(pack: Long): Unit = {
    val idx = java.lang.Math.floorMod(pack, m.toLong).toInt
    val w = java.lang.Math.floorDiv(pack, m.toLong)
    val rho =
      if (w == 0L) HllSketch.wBits(m) + 1L
      else HllSketch.wBits(m).toLong - (63 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > regs(idx)) regs(idx) = rho
  }

  def mergeFrom(other: HllBuffer): Unit = {
    var i = 0
    while (i < m) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
  }
}

/** hll_registers(pack, m) -> array<bigint> of the m register maxima. */
case class HllRegisters(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(m)

  override def update(buf: HllBuffer, row: InternalRow): HllBuffer = {
    val v = child.eval(row)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: HllBuffer, other: HllBuffer): HllBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: HllBuffer): Any = new GenericArrayData(buf.regs)

  override def serialize(buf: HllBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.m)
    bb.putInt(buf.m)
    buf.regs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new HllBuffer(bb.getInt())
    var i = 0
    while (i < buf.m) { buf.regs(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HllRegisters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegisters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HllRegisters = copy(child = cs(0))
  override def prettyName: String = "hll_registers"
}

object HllSketch {
  /** Width in bits of the rank domain w = pack div m: packs carry ~60
    * usable bits (two base-(1e9+7) hashes at 2^30), minus log2(m) for
    * the register index.
    */
  def wBits(m: Int): Int = 60 - (31 - java.lang.Integer.numberOfLeadingZeros(m))

  /** alpha_m · m² · 2^(wBits+1): the raw-estimate numerator as one
    * double literal, so `est = NUM / S` divides the same two numbers in
    * every engine (S is the exact integer Σ 2^(wBits+1 − M_j)).
    */
  def estNumerator(m: Int): Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m.toDouble * m.toDouble * math.pow(2.0, wBits(m) + 1)
  }

  def hllRegisters(pack: Column, m: Int): Column =
    ColumnBridge.column(
      HllRegisters(ColumnBridge.expression(pack), m).toAggregateExpression())
}
