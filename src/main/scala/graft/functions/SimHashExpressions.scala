package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document as ONE native map pass (the WinnowFp
  * treatment, r15): tokenize, hash and vote in a single byte-walk,
  * emitting the signature directly — where the composed form
  * ([[graft.operators.Dedup.simhashDocsComposed]], retained as the
  * executable spec) explodes the token stream and aggregates SIXTY-FOUR
  * sum(when) vote columns through an exchange. Fusing it turns every
  * simhash derivation (the dd_simhash family, the persisted index build,
  * the incremental delta probe) into an exchange-free projection.
  *
  * Bit-identical semantics: tokens = `split(lower(text), " +")` with
  * Spark's limit −1 (leading empty token when the text starts with
  * spaces, trailing empty when it ends with spaces, interior runs
  * collapse, the empty string yields one empty token); token hash =
  * Spark's `xxhash64` (XXH64 seed 42 over the token's UTF-8 bytes);
  * vote per bit +1/−1; signature bit set iff votes > 0. Lowercasing is
  * UTF8String.toLowerCase — exactly Spark's `lower`. Space means the
  * regex " +": ASCII 0x20 only, which no UTF-8 multibyte sequence
  * contains, so the byte-level split is exact on any input.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private def hashRange(bytes: Array[Byte], start: Int, len: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
      len, 42L)

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    def vote(h: Long): Unit = {
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    // regex-" +"-split with limit −1, mirrored on bytes: each space RUN
    // is one separator, the segments around the runs are the tokens —
    // including the empty leading/trailing segments Java's split keeps
    // ("" → [""], " a" → ["", "a"], "a " → ["a", ""], " " → ["", ""])
    var i = 0
    var segStart = 0
    while (i < n) {
      if (bytes(i) == ' ') {
        vote(hashRange(bytes, segStart, i - segStart))
        while (i < n && bytes(i) == ' ') i += 1
        segStart = i
      } else i += 1
    }
    vote(hashRange(bytes, segStart, n - segStart))
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }
}
