package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The k-position MinHash signature of a document as ONE native map pass
  * (the [[SimHash64]] treatment, r17): lowercase, split on space runs,
  * build word-3-gram shingles, hash each ONCE with Spark's xxhash64
  * (XXH64 seed 42), and fold k running minima of per-position universal
  * rehashes — where the composed form (retained as the executable spec,
  * [[graft.operators.Dedup.minhashSigComposed]]) explodes the shingle
  * stream and aggregates k `min` columns through an exchange. Fusing it
  * turns every signature derivation — the dd_minhash_lsh family, the
  * persisted band-index build over the FULL standing corpus
  * ([[graft.operators.Dedup.writeBandIndex]]), the incremental delta
  * probe — into an exchange-free projection: at 100 TB the index build
  * was the one remaining whole-corpus shuffle in the minhash family.
  *
  * Bit-identical semantics vs the composed spelling:
  *  - tokens = `split(lower(text), " +")` with limit −1 (leading/trailing
  *    empty tokens kept, interior space runs collapse, "" → [""]);
  *    lowercasing is UTF8String.toLowerCase — exactly Spark's `lower`;
  *    the split is byte-exact because 0x20 appears in no UTF-8 multibyte
  *    sequence.
  *  - shingles: ≥3 tokens → the n−2 word-3-grams `concat_ws(" ", t_i,
  *    t_i+1, t_i+2)`; <3 tokens → the single shingle joining ALL tokens
  *    with " ". The composed form's `array_distinct` is dropped here:
  *    `min` is idempotent, so duplicate shingles cannot move any
  *    signature position.
  *  - base hash h = `pmod(xxhash64(shingle), P)`, P = 2^31 − 1;
  *    position i's value = `(h * A(i) + B(i)) mod P`, minimized over
  *    shingles. h < 2^31 and A(i) < 2^31, so h·A(i) + B(i) < 2^62 — the
  *    long arithmetic is exact in both engines' spellings.
  *
  * The (A, B) family is where r17 FIXED a latent degeneracy: the r4-r16
  * rehash `h * (2i+1) + i*99991` had no outer `mod P`, making every
  * position an order-PRESERVING affine map of the same h — all k minima
  * came from the single argmin-h shingle, every band hash was a function
  * of that one value, and the banding's S-curve collapsed to single-hash
  * collision probability (P[collide] = j instead of 1−(1−j^r)^b). The
  * outer mod makes each position an independent permutation of Z_P;
  * A(i) ∈ [1, P), B(i) ∈ [0, P) derive from a splitmix64 mix of the
  * position index so the multipliers are well-spread (a small odd
  * multiplier wraps only a few times across the domain and its argmin
  * is coarse).
  *
  * NULL text: callers pass `coalesce(text, "")` — NULL and "" both
  * shingle to the single "" shingle in the composed spelling, so the
  * identity holds without a null branch here.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "signature length must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** 2^31 − 1 (prime): the rehash modulus. Public so the composed
    * spelling and the oracle-side SQL share the one constant. */
  val P = 2147483647L

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Position i's multiplier, in [1, P): a splitmix64 mix of 2i. */
  def aCoef(i: Int): Long = Math.floorMod(mix(2L * i), P - 1) + 1L

  /** Position i's offset, in [0, P): a splitmix64 mix of 2i + 1. */
  def bCoef(i: Int): Long = Math.floorMod(mix(2L * i + 1), P)

  // coefficient arrays memoized per signature length (k is a literal at
  // every call site; the map stays single-digit sized)
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coefs(k: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(k, kk =>
      (Array.tabulate(kk)(aCoef), Array.tabulate(kk)(bCoef)))

  private def hashRange(bytes: Array[Byte], start: Int, len: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
      len, 42L)

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val (as, bs) = coefs(k)
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    // token boundaries: the byte-level mirror of regex-" +" split with
    // limit −1 (see SimHash64.compute — same walk, boundaries recorded
    // instead of hashed)
    val tokStart = new Array[Int](n / 2 + 2)
    val tokLen = new Array[Int](n / 2 + 2)
    var nTok = 0
    var i = 0
    var segStart = 0
    while (i < n) {
      if (bytes(i) == ' ') {
        tokStart(nTok) = segStart; tokLen(nTok) = i - segStart; nTok += 1
        while (i < n && bytes(i) == ' ') i += 1
        segStart = i
      } else i += 1
    }
    tokStart(nTok) = segStart; tokLen(nTok) = n - segStart; nTok += 1
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // shingle buffer: reused across windows; max shingle = 3 longest
    // tokens + 2 separators ≤ n + 2
    val buf = new Array[Byte](n + 2)
    def fold(h31: Long): Unit = {
      var j = 0
      while (j < k) {
        val v = (h31 * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    def shingleOf(from: Int, count: Int): Unit = {
      var len = 0
      var t = from
      val end = from + count
      while (t < end) {
        if (t > from) { buf(len) = ' '; len += 1 }
        System.arraycopy(bytes, tokStart(t), buf, len, tokLen(t))
        len += tokLen(t)
        t += 1
      }
      fold(Math.floorMod(hashRange(buf, 0, len), P))
    }
    if (nTok >= 3) {
      var w = 0
      while (w <= nTok - 3) { shingleOf(w, 3); w += 1 }
    } else shingleOf(0, nTok)
    new GenericArrayData(mins)
  }
}
