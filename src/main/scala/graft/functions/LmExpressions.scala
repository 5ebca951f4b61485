package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Char-n-gram LM scoring fused into ONE native pass (the BpeEncode
  * treatment): the bounded model rides the expression node as a hash map
  * attached to generated code via a reference object, and each document is
  * scored in a single walk over its code points — no per-gram explode, no
  * broadcast-join probe rows, no re-aggregation shuffle. Scoring 100 TB
  * becomes a map-only projection (the composed form was already
  * broadcast-bounded, but paid a 3-row-per-char explode and one doc_id
  * exchange). Bonus: the per-gram log2 terms accumulate in CHAR ORDER, so
  * the float score is deterministic, where the exploded aggregate summed
  * in shuffle order.
  *
  * Gram semantics mirror the composed charsOf/charGramsFromChars exactly
  * (spec-pinned): code-point grams of the LOWERCASED text; a text shorter
  * than `n` code points contributes its whole self as ONE gram (the empty
  * text contributes the empty gram). Scoring: add-one smoothing,
  * score = -mean log2((cnt+1)/(total+v)).
  */
case class LmScore(child: Expression, model: Seq[(String, Long)], n: Int,
    total: Double, v: Double)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lm_score needs string input, got $other")
  }

  @transient private lazy val counts: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](model.size * 2)
    model.foreach { case (g, c) => m.put(g, java.lang.Long.valueOf(c)) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    LmScore.compute(input.asInstanceOf[UTF8String], counts, n, total, v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("lmCounts", counts, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmScore.compute($c, $mapRef, $n, $total, $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): LmScore =
    copy(child = newChild)
  override def prettyName: String = "lm_score"
}

object LmScore {
  private def log2(x: Double): Double = Math.log(x) / Math.log(2.0)

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String,
      counts: java.util.HashMap[String, java.lang.Long],
      n: Int, total: Double, v: Double): InternalRow = {
    // UTF8String.toLowerCase is exactly Spark's lower() — the composed
    // form's charsOf(lower(text))
    val str = text.toLowerCase.toString
    val denom = total + v
    var nGrams = 0L
    var nOov = 0L
    var acc = 0.0
    def scoreGram(g: String): Unit = {
      val c = counts.get(g)
      nGrams += 1
      if (c == null) {
        nOov += 1
        acc += log2(1.0 / denom)
      } else acc += log2((c.longValue() + 1.0) / denom)
    }
    val len = str.length
    // code-point start offsets (surrogate-pair safe — the composed split
    // keeps pairs together)
    val cpCount = str.codePointCount(0, len)
    if (cpCount < n) scoreGram(str)
    else {
      val starts = new Array[Int](cpCount + 1)
      var off = 0
      var i = 0
      while (i < cpCount) {
        starts(i) = off
        off += Character.charCount(str.codePointAt(off))
        i += 1
      }
      starts(cpCount) = len
      var p = 0
      while (p <= cpCount - n) {
        scoreGram(str.substring(starts(p), starts(p + n)))
        p += 1
      }
    }
    InternalRow(nGrams, nOov, -acc / nGrams)
  }
}
