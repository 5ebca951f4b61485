package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Property fuzz for [[GlobalRowNumberRewrite]]'s r13 families — the rank
  * family (distinct-key decomposition) and whole-input aggregates — on
  * shapes the named tests never produce: random tie densities, random
  * sort DIRECTION and NULL ORDERING per trial, null-bearing keys,
  * all-ties tables, signed values. Every trial compares the rewritten
  * plan's rows bit-for-bit against the stock single-window plan (rank,
  * dense_rank, percent_rank and cume_dist are tie-order-INSENSITIVE, so
  * exact equality is well-defined even on heavy ties). Seeded — failures
  * reproduce.
  */
class GlobalWindowRewritePropSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)

  private def assertSameRows(a: DataFrame, b: DataFrame, hint: String): Unit = {
    val ra = a.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val rb = b.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(ra.length == rb.length, s"$hint: ${ra.length} vs ${rb.length} rows")
    assert(ra.sameElements(rb),
      s"$hint: first diff at ${ra.zip(rb).indexWhere(p => p._1 != p._2)}")
  }

  private def randomTable(n: Int, keyDomain: Int): DataFrame =
    (0 until n).map { i =>
      val k = rnd.nextInt(keyDomain)
      ( i.toLong,
        if (k == 0 && rnd.nextBoolean()) None else Some(k.toLong), // nullable
        rnd.nextLong() % 1000L)
    }.toDF("id", "k", "w")

  private def rewriteOf(df: DataFrame): DataFrame = {
    val a = df.queryExecution.optimizedPlan
    val r = GlobalRowNumberRewrite(a)
    assert(r ne a, "rule did not fire")
    ColumnBridge.ofRows(spark, r)
  }

  test("rank family == stock on random tie densities, directions and " +
      "null orderings") {
    for (trial <- 1 to 4) {
      val n = 100 + rnd.nextInt(1500)
      // keyDomain 1 on the last trial: EVERY row is one peer group
      val df = randomTable(n, if (trial == 4) 1 else 1 + rnd.nextInt(9))
      val key = (rnd.nextInt(4): @unchecked) match {
        case 0 => col("k").asc
        case 1 => col("k").desc
        case 2 => col("k").asc_nulls_last
        case 3 => col("k").desc_nulls_first
      }
      val q = df
        .withColumn("r", rank().over(Window.orderBy(key)))
        .withColumn("dr", dense_rank().over(Window.orderBy(key)))
        .withColumn("pr", percent_rank().over(Window.orderBy(key)))
        .withColumn("cd", cume_dist().over(Window.orderBy(key)))
      assertSameRows(rewriteOf(q), q, s"trial $trial (n=$n, key=$key)")
    }
  }

  test("whole-input aggregates == stock on random signed data") {
    for (trial <- 1 to 3) {
      val n = 100 + rnd.nextInt(1500)
      val df = randomTable(n, 1 + rnd.nextInt(6))
      val q = df
        .withColumn("s", sum(col("w")).over(Window.partitionBy()))
        .withColumn("mn", min(col("k")).over(Window.partitionBy()))
        .withColumn("av", avg(col("w")).over(Window.partitionBy()))
        .withColumn("share", col("w") / sum(col("w")).over(Window.partitionBy()))
      assertSameRows(rewriteOf(q), q, s"trial $trial (n=$n)")
    }
  }
}
