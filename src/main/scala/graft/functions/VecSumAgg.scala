package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise SUM over array<double> rows — the distributed
  * linear-algebra primitive under the covariance/Gram faces: each
  * partition folds its rows into ONE fixed-width double vector and only
  * the d (or d²) partial buffers cross the exchange, never the rows. The
  * alternative spellings both break at scale: posexplode + groupBy(pos)
  * shuffles n·d rows, and a driver-side fold isn't distributed at all.
  * Buffer width fixes to the first input's length; a ragged input row
  * fails loudly (a silent truncation would corrupt every statistic built
  * on top).
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def inputTypes = Seq(ArrayType(DoubleType))

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.isEmpty) {
        val out = new Array[Double](n)
        var i = 0
        while (i < n) { out(i) = arr.getDouble(i); i += 1 }
        out
      } else {
        require(buf.length == n,
          s"vec_sum: ragged input — buffer ${buf.length} vs row $n")
        var i = 0
        while (i < n) { buf(i) += arr.getDouble(i); i += 1 }
        buf
      }
    }
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      require(buf.length == other.length,
        s"vec_sum: ragged merge — ${buf.length} vs ${other.length}")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "vec_sum"
}
