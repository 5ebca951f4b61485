package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization hot-path expressions (SURVEY.md §2.8 #140).
  *
  * The composed forms (one `transform(slice → zip_with → aggregate)` per
  * subspace for encoding, `aggregate(zip_with(...))` for ADC) are
  * bit-identical but higher-order functions evaluate interpreted and fall
  * outside WholeStageCodegen — 16 chained interpreted projections made the
  * PQ encode the face's dominant cost. These fuse each into one generated
  * loop, the same treatment [[CosineSim]] and [[HyperplaneSig]] got.
  */

/** Encode one vector to its PQ codes: per subspace, the index of the
  * L2-nearest sub-centroid (lowest index wins ties). The codebooks ride in
  * the expression node as a flattened double array (m × k × sub), attached
  * to generated code via a reference object — no per-row allocation beyond
  * the output codes. */
case class PqEncode(child: Expression, books: Array[Double],
    m: Int, k: Int, sub: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<double> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], books, m, k, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqEncode.compute($c, $booksRef, $m, $k, $sub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** One fused pass over all subspaces and centroids; shared by
    * interpreted eval and generated code. `books` is laid out
    * [(mi * k + c) * sub + j]. */
  def compute(v: ArrayData, books: Array[Double], m: Int, k: Int, sub: Int): ArrayData = {
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val base = (mi * k + c) * sub
        var d = 0.0
        var j = 0
        while (j < sub) {
          val idx = mi * sub + j
          val x = if (idx < v.numElements()) v.getDouble(idx) else 0.0
          val diff = x - books(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }
}

/** ADC score: sum over subspaces of the query's precomputed
  * sub-inner-product table at each code — `table` is array<array<double>>
  * (m × k), `codes` is array<int> (m). */
case class AdcScore(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"adc_score needs (array<int>, array<array<double>>), got $other")
    }

  override protected def nullSafeEval(codes: Any, table: Any): Any =
    AdcScore.compute(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.functions.AdcScore.compute($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object AdcScore {
  def compute(codes: ArrayData, table: ArrayData): Double = {
    val m = math.min(codes.numElements(), table.numElements())
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val row = table.getArray(mi)
      val c = codes.getInt(mi)
      if (c >= 0 && c < row.numElements()) s += row.getDouble(c)
      mi += 1
    }
    s
  }
}
