package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min sketch plumbing for the persistable-sketch posture (the HLL
  * q_sketch_union shape applied to FREQUENCIES instead of distinct counts):
  * partitions keep their own sketch built by Spark's builtin
  * `count_min_sketch` aggregate, the fleet-wide answer is a cell-wise-sum
  * UNION over the stored sketch binaries (associative and commutative —
  * deterministic regardless of merge order), and point lookups never
  * rescan the corpus. CMS guarantees: est >= exact always (counters only
  * overcount), est <= exact + eps·N with probability >= confidence; both
  * are certified engine-side by the `_check` face.
  */
object CmsOps {
  def merge(a: CountMinSketch, bytes: Array[Byte]): CountMinSketch = {
    val other = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    if (a == null) other else { a.mergeInPlace(other); a }
  }

  def toBytes(s: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    s.writeTo(bos)
    bos.toByteArray
  }

  /** Point estimate from a serialized sketch. Spark's builtin aggregate
    * adds StringType values as their UTF-8 bytes; estimating with the same
    * UTF8String bytes makes lookup and build hash identically. */
  def estimate(sketchBytes: Array[Byte], item: UTF8String): Long =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))
      .estimateCount(item.getBytes)
}

/** Merge aggregate over serialized CMS binaries (the sketches themselves
  * come from Spark's builtin `count_min_sketch` per group/partition).
  * Exchange cost: one depth×width counter table per partial buffer, never
  * the keyed stream. */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  // both functions are SQL-registered: a wrong-typed call must fail at
  // analysis, not as an executor ClassCastException (AbstractDataType is
  // private[sql], so the override type is inferred as Seq[DataType])
  override def inputTypes = Seq(BinaryType)

  // buffer is the serialized form: merges are infrequent (one per input
  // sketch row), so re-parsing beats carrying a live object through the
  // serialize/deserialize contract
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val in = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) in.clone()
      else CmsOps.toBytes(CmsOps.merge(
        CountMinSketch.readFrom(new ByteArrayInputStream(buf)), in))
    }
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else CmsOps.toBytes(CmsOps.merge(
      CountMinSketch.readFrom(new ByteArrayInputStream(buf)), other))

  override def eval(buf: Array[Byte]): Any = if (buf.isEmpty) null else buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_merge"
}

/** `cms_estimate(sketch_binary, item)` — point frequency lookup. Query-side
  * only (rows = number of looked-up items), so the per-call deserialize is
  * not on any hot path. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(BinaryType, StringType)

  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    CmsOps.estimate(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, i) =>
      s"graft.functions.CmsOps.estimate($s, $i)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_estimate"
}
