package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** VecSumAgg (element-wise array sum) + the covariance operator built on
  * it: hand-computed values, null/ragged handling, and the scale shape —
  * one aggregate, no explode/groupBy(pos) of n·d rows.
  */
class VecSumSpec extends SparkSpec {
  import spark.implicits._

  test("vec_sum: element-wise, null rows skipped, ragged fails loudly") {
    val df = Seq(Some(Seq(1.0, 2.0, 3.0)), Some(Seq(10.0, 20.0, 30.0)), None)
      .toDF("v")
    val out = df.agg(GraftFunctions.vec_sum($"v")).as[Seq[Double]].collect()
    assert(out.head == Seq(11.0, 22.0, 33.0))
    val ragged = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("v")
    val e = intercept[Exception] {
      ragged.coalesce(1).agg(GraftFunctions.vec_sum($"v")).collect()
    }
    assert(e.getMessage != null)
  }

  test("covariance: matches the hand formula; diagonal is the variance; " +
    "plan is one aggregate, not an n·d² explode") {
    // 4 vectors, dim 3; population covariance computed by hand
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 0.0f)),
      (2L, Array(2.0f, 1.0f, 0.0f)),
      (3L, Array(3.0f, 4.0f, 1.0f)),
      (4L, Array(4.0f, 3.0f, 1.0f))).toDF("vec_id", "embedding")
    val cov = Similarity.covariance(vecs, dim = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cov.size == 6) // upper triangle of 3x3
    // means: (2.5, 2.5, 0.5); var x = ((1.5)²+(0.5)²+(0.5)²+(1.5)²)/4 = 1.25
    assert(cov((0L, 0L)) == 1.25)
    assert(cov((1L, 1L)) == 1.25)
    assert(cov((2L, 2L)) == 0.25)
    // cov(x,y) = (1·2+2·1+3·4+4·3)/4 − 2.5·2.5 = 28/4 − 6.25 = 0.75
    assert(cov((0L, 1L)) == 0.75)
    // cov(x,z) = (0+0+3+4)/4 − 2.5·0.5 = 1.75 − 1.25 = 0.5
    assert(cov((0L, 2L)) == 0.5)
    assert(cov((1L, 2L)) == 0.5)
    // scale shape: the row stream folds through ONE aggregate; no
    // per-element explode feeding a groupBy(pos)
    val plan = Similarity.covariance(vecs, dim = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    val explodeBeforeAgg = plan.linesIterator
      .dropWhile(l => !l.contains("ObjectHashAggregate"))
      .exists(_.contains("Generate"))
    assert(!explodeBeforeAgg, s"explode feeds the aggregate:\n$plan")
  }
}
