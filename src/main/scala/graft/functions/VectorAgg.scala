package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Entrywise vector-sum aggregate: folds a corpus of fixed-dimension
  * `array<double>` rows into ONE d-length sum vector. The buffer is
  * d doubles and merges entrywise, so Spark plans a map-side partial
  * and each task ships exactly d doubles — the scale-correct way to
  * compute embedding centroids and per-dimension moments, vs the
  * posexplode + groupBy(dim) shape whose shuffle carries d× the corpus
  * row count. Same bounded-mergeable-state family as KMV (q74) and CMS
  * (q108), for dense vectors.
  */
final class VecSumBuffer(val dim: Int) extends Serializable {
  val sums = new Array[Double](dim)

  def insert(arr: ArrayData): Unit = {
    // dim is fixed at plan time; a row of any other width means the
    // declared vector width is wrong, and silently truncating/partially
    // summing it would corrupt every downstream centroid and moment.
    require(arr.numElements() == dim,
      s"vec_sum(dim=$dim) got a vector of length ${arr.numElements()}")
    var i = 0
    while (i < dim) {
      if (!arr.isNullAt(i)) sums(i) += arr.getDouble(i)
      i += 1
    }
  }

  def mergeFrom(other: VecSumBuffer): Unit = {
    var i = 0
    while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
  }
}

/** vec_sum(v, dim) -> array<double>: entrywise sum of the input
  * vectors (dim fixed at plan time).
  */
case class VecSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer(dim)

  override def update(buf: VecSumBuffer, row: InternalRow): VecSumBuffer = {
    val v = child.eval(row)
    if (v != null) buf.insert(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: VecSumBuffer): Any = new GenericArrayData(buf.sums)

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.dim)
    bb.putInt(buf.dim)
    buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecSumBuffer(bb.getInt())
    var i = 0
    while (i < buf.dim) { buf.sums(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): VecSum = copy(child = cs(0))
  override def prettyName: String = "vec_sum"
}

object VectorAgg {
  def vecSum(v: Column, dim: Int): Column =
    ColumnBridge.column(
      VecSum(ColumnBridge.expression(v), dim).toAggregateExpression())
}
