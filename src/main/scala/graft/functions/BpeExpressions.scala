package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding as a native codegen expression (SURVEY.md §2.9).
  *
  * The merges table rides in the expression node as a rank map attached to
  * generated code via a reference object — the [[PqEncode]] treatment: the
  * model broadcasts with the plan, the encode is a MAP-ONLY projection, and
  * a 100 TB corpus tokenizes without a shuffle. A lambda-composed form
  * can't express the iterative merge loop at all, and a Scala UDF would
  * leave whole-stage codegen; this keeps the hot loop generated.
  *
  * Input: the document text. Output: the BPE token array over the
  * whitespace pre-tokenization (tokens never span whitespace; the
  * concatenation of the output equals the concatenation of the words —
  * spec- and check-face-certified losslessness).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs string input, got $other")
  }

  // rank map keyed "a b" (a space can't occur inside a symbol: symbols
  // come from whitespace-split words) — built once per plan, shared by
  // interpreted eval and generated code
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = BpeEncode.rankMap(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeEncode.compute($c, $ranksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, Integer.valueOf(i))
    }
    m
  }

  /** Split a word into per-code-point symbols (surrogate-pair safe — the
    * same unit the trainer uses). */
  def codePointSymbols(word: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out.add(word.substring(i, i + n))
      i += n
    }
    out
  }

  /** Standard BPE apply (the GPT-2 loop): repeatedly find the
    * LOWEST-RANKED merge present among adjacent symbols and fuse every
    * occurrence left-to-right, until no known pair remains. Deterministic
    * given the rank map. */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    var syms = codePointSymbols(word)
    var done = syms.size() < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.size() - 1) {
        val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val next = new java.util.ArrayList[String](syms.size())
        var j = 0
        while (j < syms.size()) {
          if (j < syms.size() - 1 && {
            val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
            r != null && r.intValue() == bestRank
          }) {
            next.add(syms.get(j) + syms.get(j + 1))
            j += 2
          } else {
            next.add(syms.get(j))
            j += 1
          }
        }
        syms = next
        done = syms.size() < 2
      }
    }
    syms
  }

  /** Whole-document encode: whitespace pre-tokenization, per-word BPE. */
  def compute(text: UTF8String, ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val words = text.toString.split("\\s+")
    val out = new java.util.ArrayList[UTF8String]()
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        val toks = encodeWord(words(w), ranks)
        var t = 0
        while (t < toks.size()) {
          out.add(UTF8String.fromString(toks.get(t)))
          t += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}
