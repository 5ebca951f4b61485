package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items buffer: at most `k` (item, count) counters.
  * `decremented` witnesses the total weight removed by trims, so for every
  * item the true frequency lies in [est, est + decremented] — and any item
  * with true frequency > decremented is guaranteed present. The classic
  * bound: decremented <= n / (k + 1).
  */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, java.lang.Long]()
  var decremented: Long = 0L

  def add(item: String, w: Long): Unit = {
    val cur = counts.get(item)
    if (cur != null) { counts.put(item, cur + w); () }
    else { counts.put(item, w); trim() }
  }

  /** Restore |counters| <= k: subtract the (k+1)-th largest count from all
    * counters and drop the non-positive (one step suffices — at most k
    * counters can exceed that value). This is the MERGEABLE form of the MG
    * decrement (Agarwal et al., "Mergeable Summaries"), which both the
    * per-row update (insert at weight w, then trim) and the partial-buffer
    * merge (sum counters, then trim) reduce to. */
  private def trim(): Unit = {
    if (counts.size <= k) return
    val vals = new Array[Long](counts.size)
    val it0 = counts.values().iterator()
    var i = 0
    while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val c = vals(vals.length - 1 - k) // (k+1)-th largest
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= c) it.remove()
      else e.setValue(e.getValue - c)
    }
    decremented += c
  }

  def mergeFrom(other: MgBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    decremented += other.decremented
    trim()
  }
}

/** Native Misra-Gries heavy-hitters aggregate: one pass, k bounded
  * counters per partial buffer regardless of the domain size, merge =
  * counter sum + one trim — the exchange moves <= k counters per
  * partition where an exact groupBy would shuffle the whole keyed stream.
  * Guarantees (classic MG): every item with true frequency > n/(k+1) is
  * present, and each estimate undercounts by at most `err_bound` (the
  * witnessed total trim weight, itself <= n/(k+1)). When the distinct-item
  * count never exceeds k, no trim ever fires and the sketch is EXACT with
  * err_bound = 0.
  *
  * Output: struct<items: array<struct<item, est>> in (est desc, item asc)
  * order, err_bound: bigint>. */
case class MgFreqItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(
      StructType(Seq(StructField("item", StringType), StructField("est", LongType))),
      containsNull = false)),
    StructField("err_bound", LongType)))

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (item, est) => (-est, item) }
    val arr = sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est): Any
    }
    InternalRow(new GenericArrayData(arr), buf.decremented)
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.writeLong(buf.decremented)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MgBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf.decremented = in.readLong()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgFreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgFreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgFreqItems =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_freq_items"
}
