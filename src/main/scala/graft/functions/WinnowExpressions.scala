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

/** Stride-window xxhash64 as ONE native pass — the fused form of
  * `transform(sequence(0, (nc-w)/stride), i => xxhash64(substring(text,
  * 1+i*stride, w)))` that [[graft.operators.Dedup.substrDup]] feeds its
  * window stream from. The composed form re-seeks every window's UTF-8
  * char boundary from the string START (`substring` is char-addressed), so
  * a document pays O(len²/stride) byte scanning — the same bug class the
  * char-gram extractor and [[WinnowFp]] fixed. Here the boundary index is
  * built once and each window hashes its byte range in place via the exact
  * XXH64 Spark's `xxhash64` uses (seed 42) — bit-identical output
  * (spec-pinned on multibyte text AND malformed UTF-8: the walk mirrors
  * UTF8String.numBytesForFirstByte, invalid lead bytes advancing 1), O(len)
  * total. One pinned divergence: a multibyte lead truncated at the buffer
  * end makes UTF8String.substring overshoot numBytes and copy undefined
  * trailing bytes — the fused walk clamps to the buffer instead (defined,
  * deterministic; FusedExprPropSpec pins both behaviors).
  */
case class StrideWinHashes(child: Expression, w: Int, stride: Int)
    extends UnaryExpression {
  require(w > 0 && stride > 0, "window and stride must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    StrideWinHashes.compute(input.asInstanceOf[UTF8String], w, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StrideWinHashes.compute($c, $w, $stride)")

  override protected def withNewChildInternal(newChild: Expression): StrideWinHashes =
    copy(child = newChild)
}

object StrideWinHashes {
  private val EMPTY = new GenericArrayData(new Array[Long](0))

  /** Shared by interpreted eval and generated code. Texts shorter than `w`
    * chars produce an empty array (callers filter or explode). */
  def compute(s: UTF8String, w: Int, stride: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val starts = new Array[Int](n + 1)
    var nc = 0
    var off = 0
    while (off < n) {
      starts(nc) = off
      // mirror UTF8String.numBytesForFirstByte exactly (invalid lead bytes
      // advance 1) so char addressing agrees with Spark's `substring` on
      // ARBITRARY byte content, not just valid UTF-8 — the bit-identical
      // pin vs the composed form must hold on malformed text too
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nc += 1
    }
    starts(nc) = n
    if (nc < w) return EMPTY
    val nWins = (nc - w) / stride + 1
    val out = new Array[Long](nWins)
    var x = 0
    var p = 0
    while (x < nWins) {
      val sb = starts(p)
      // Spark's xxhash64(string) = XXH64(bytes, seed 42) over the UTF-8
      // bytes; a char-substring's bytes are exactly this range.
      out(x) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + sb,
        starts(p + w) - sb, 42L)
      p += stride
      x += 1
    }
    new GenericArrayData(out)
  }
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
      // same numBytesForFirstByte mirror as StrideWinHashes (see above)
      off += UTF8String.numBytesForFirstByte(bytes(off))
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
