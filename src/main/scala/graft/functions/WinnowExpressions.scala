package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints as ONE native pass (the fused-codegen treatment
  * the PQ expressions got): char-`k`-gram rolling hashes + `w`-window
  * minima + dedup, emitted as array<long>. Bit-identical to the composed
  * form — transform(substr → RollingHash → mask) → slice/array_min →
  * array_distinct (spec-pinned) — but with no per-gram UTF8String
  * allocation: gram hashes fold directly over the text's bytes with a
  * char-boundary index, and selection runs over a primitive ring. */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WinnowFp.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFp.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {
  private val EMPTY = new GenericArrayData(new Array[Long](0))

  /** Shared by interpreted eval and generated code. Chars shorter than
    * k + w - 1 produce an empty array (the caller filters or explodes). */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // char start offsets (UTF-8 boundary scan): charStart(i) = byte offset
    // of char i; total chars = nc
    val starts = new Array[Int](n + 1)
    var nc = 0
    var off = 0
    while (off < n) {
      starts(nc) = off
      val b = bytes(off) & 0xff
      off += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
      nc += 1
    }
    starts(nc) = n
    if (nc < k + w - 1) return EMPTY
    val nGrams = nc - k + 1
    // gram hashes: same fold as RollingHash over the gram's bytes, masked
    // to 63 bits so signed ordering equals the oracle's unsigned ordering
    val gh = new Array[Long](nGrams)
    var p = 0
    while (p < nGrams) {
      var h = 1125899906842597L
      var i = starts(p)
      val end = starts(p + k)
      while (i < end) { h = h * 257L + (bytes(i) & 0xff); i += 1 }
      gh(p) = h & Long.MaxValue
      p += 1
    }
    // window minima, deduped preserving first occurrence (array_distinct
    // semantics on the composed form)
    val out = new Array[Long](nGrams - w + 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    var m = 0
    var j = 0
    while (j <= nGrams - w) {
      var mn = gh(j)
      var t = j + 1
      while (t < j + w) { if (gh(t) < mn) mn = gh(t); t += 1 }
      if (seen.add(mn)) { out(m) = mn; m += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}
