package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH signature (`nBits` sign bits) of a double-array
  * vector, as a native codegen expression.
  *
  * The composed form — one `aggregate(zip_with(vec, plane, *))` per bit per
  * table — is correct but each higher-order function evaluates interpreted,
  * outside whole-stage codegen, and the signature is THE map-side hot loop
  * of hyperplane LSH (nBits × nTables plane dots per row). This expression
  * fuses all `nBits` dots into one pass over the vector with on-the-fly
  * Rademacher plane components, inside codegen.
  *
  * Bit-identical to the composed form: ascending-index accumulation per
  * dot, identical splitmix64-derived ±1 components (seeded by
  * `table * 10007 + bit`), `> 0` sign rule.
  */
case class HyperplaneSig(child: Expression, nBits: Int, table: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig needs array<double> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], nBits, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneSig.compute($c, $nBits, $table)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Deterministic ±1 Rademacher component for (plane i, dim j) — a
    * splitmix64-style bit mix, so planes are literal-free and identical
    * across executors with zero broadcast. */
  def sign(i: Int, j: Int): Double = {
    var z = i.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL + 0xD6E8FEB86659FD93L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 1L) 1.0 else -1.0
  }

  /** All nBits plane dots in one fused pass; shared by interpreted eval and
    * generated code. Null elements contribute nothing to any dot (the
    * vector hashes on its remaining components). NOT the composed form's
    * behavior — aggregate(zip_with(...)) nulls every dot, piling every
    * null-bearing vector into bucket 0 of every table, which at scale
    * concentrates them into exactly the quadratic within-bucket blowup
    * the buckets exist to prevent. Skipping spreads them like any other
    * vector, deterministically. */
  def compute(a: ArrayData, nBits: Int, table: Int): Long = {
    val n = a.numElements()
    val dots = new Array[Double](nBits)
    var j = 0
    while (j < n) {
      if (!a.isNullAt(j)) {
        val x = a.getDouble(j)
        var i = 0
        while (i < nBits) {
          dots(i) += x * sign(table * 10007 + i, j)
          i += 1
        }
      }
      j += 1
    }
    var bits = 0L
    var i = 0
    while (i < nBits) {
      if (dots(i) > 0) bits |= 1L << i
      i += 1
    }
    bits
  }
}
