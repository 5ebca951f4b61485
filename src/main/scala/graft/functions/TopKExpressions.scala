package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k selection buffer: (cos desc, vec_id asc) order, at most
  * `k` entries, insertion by linear shift (k is small — ANN k or the PQ
  * rerank bound). Used as the object buffer of [[TopKSelect]]. */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val cos: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** true if (c1, id1) ranks strictly better than (c2, id2). */
  @inline private def better(c1: Double, id1: Long, c2: Double, id2: Long): Boolean =
    c1 > c2 || (c1 == c2 && id1 < id2)

  def insert(id: Long, c: Double, dedup: Boolean): Unit = {
    if (dedup) {
      var i = 0
      while (i < n) { if (ids(i) == id) return; i += 1 }
    }
    if (n == k && !better(c, id, cos(n - 1), ids(n - 1))) return
    // find insertion point (first slot the new entry beats)
    var pos = if (n == k) n - 1 else n
    while (pos > 0 && better(c, id, cos(pos - 1), ids(pos - 1))) pos -= 1
    if (pos >= k) return
    // shift down, dropping the last entry if full
    var j = math.min(n, k - 1)
    while (j > pos) { cos(j) = cos(j - 1); ids(j) = ids(j - 1); j -= 1 }
    cos(pos) = c
    ids(pos) = id
    if (n < k) n += 1
  }

  def mergeFrom(other: TopKBuffer, dedup: Boolean): Unit = {
    var i = 0
    while (i < other.n) { insert(other.ids(i), other.cos(i), dedup); i += 1 }
  }
}

/** Native partial top-k aggregate (the ANN selection hot path): per group,
  * keep the `k` best (cos desc, vec_id asc) entries of the input
  * struct(vec_id, cos) stream. A `TypedImperativeAggregate` buffer is a
  * plain JVM object serialized only at the partial/final boundary, so the
  * per-scored-row cost is two primitive reads + a bounded insert — no
  * row↔case-class encoding like a Dataset Aggregator, no Window exchange
  * of the scored set. `dedup` collapses repeated vec_ids with identical
  * scores (LSH multi-table collisions) inside the bound.
  *
  * Output: array<struct<vec_id, cos>> in rank order. */
case class TopKSelect(
    child: Expression,
    k: Int,
    dedup: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("vec_id", LongType), StructField("cos", DoubleType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b)) if a.dataType == LongType && b.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_select needs struct<bigint, double> input, got $other")
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row != null) buf.insert(row.getLong(0), row.getDouble(1), dedup)
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other, dedup)
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = InternalRow(buf.ids(i), buf.cos(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.cos(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    buf.n = n
    var i = 0
    while (i < n) { buf.ids(i) = bb.getLong(); buf.cos(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSelect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSelect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSelect =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_select"
}
