package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pins GraftFunctions.sum_dec_exact ≡ sum(cast(DECIMAL(28,s))) — value,
  * dtype and null semantics — on fuzzed doubles (negatives, nulls,
  * many-digit fractions), grouped and ungrouped, plus empty and all-null
  * groups. The two spellings must agree BIT-FOR-BIT after the faces'
  * final .cast("double").
  */
class Int128SumSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(12817)

  private def check(xs: Seq[Option[Double]], scale: Int): Unit = {
    val df = xs.toDF("x")
    val old = df.agg(sum(col("x").cast(DecimalType(28, scale))).as("s"))
    val neu = df.agg(GraftFunctions.sum_dec_exact(col("x"), scale).as("s"))
    assert(old.schema == neu.schema,
      s"dtype diverged: ${old.schema} vs ${neu.schema}")
    val a = old.collect()(0)
    val b = neu.collect()(0)
    assert(a == b, s"value diverged on scale=$scale: $a vs $b\n xs=$xs")
    val ad = old.select(col("s").cast("double")).collect()(0)
    val bd = neu.select(col("s").cast("double")).collect()(0)
    assert(ad == bd, s"double cast diverged: $ad vs $bd")
  }

  test("ungrouped: fuzzed values, scales 0/2/4") {
    for (scale <- Seq(0, 2, 4); _ <- 1 to 6) {
      val xs = Seq.fill(50 + rnd.nextInt(200)) {
        if (rnd.nextInt(10) == 0) None
        else Some((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(10)))
      }
      check(xs, scale)
    }
  }

  test("empty and all-null inputs yield NULL like sum") {
    check(Seq.empty[Option[Double]], 4)
    check(Seq(None, None, None), 4)
  }

  test("grouped: per-group sums match and groups stay intact") {
    val rows = Seq.fill(500)((rnd.nextInt(4).toString,
      if (rnd.nextInt(12) == 0) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * 1e6)))
      .toDF("g", "x")
    val old = rows.groupBy(col("g"))
      .agg(sum(col("x").cast(DecimalType(28, 4))).as("s"))
      .orderBy(col("g")).collect().map(_.toString)
    val neu = rows.groupBy(col("g"))
      .agg(GraftFunctions.sum_dec_exact(col("x"), 4).as("s"))
      .orderBy(col("g")).collect().map(_.toString)
    assert(old.sameElements(neu), s"grouped diverged:\n${old.mkString("\n")}\n--\n${neu.mkString("\n")}")
  }

  test("window running sum matches sum(cast) frame-for-frame") {
    import org.apache.spark.sql.expressions.Window
    val rows = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextLong(),
      (rnd.nextDouble() - 0.5) * 1e5)).toDF("k", "ord", "x")
    val w = Window.partitionBy(col("k")).orderBy(col("ord"))
    val old = rows.select(col("k"), col("ord"),
      sum(col("x").cast(DecimalType(28, 4))).over(w).as("rs"))
      .orderBy(col("k"), col("ord")).collect().map(_.toString)
    val neu = rows.select(col("k"), col("ord"),
      GraftFunctions.sum_dec_exact(col("x"), 4).over(w).as("rs"))
      .orderBy(col("k"), col("ord")).collect().map(_.toString)
    assert(old.sameElements(neu), "window running sums diverged")
  }

  test("128-bit carries: sums crossing the int64 boundary repeatedly") {
    // 10^14-scale values at scale 4 → unscaled 10^18 per row: a few rows
    // cross Long.MaxValue, exercising the carry path both signs
    val xs = Seq.fill(40)(Some((rnd.nextDouble() - 0.5) * 2e14))
    check(xs, 4)
    check(xs.map(_.map(-_)), 4)
  }
}
