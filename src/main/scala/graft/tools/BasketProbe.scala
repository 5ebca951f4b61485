package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17: q_basket_pairs/q_basket_rules — does generating per-order pairs
  * from a collected items array (one exchange, map-side pair fan-out)
  * beat the orderkey self-join?  Values must be identical (exact integer
  * supports). `runMain graft.tools.BasketProbe <sfDir>`
  */
object BasketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def b = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()

    def joinPairs(): DataFrame =
      b.select(col("l_orderkey"), col("l_partkey").as("pa"))
        .join(b.select(col("l_orderkey"), col("l_partkey").as("pb")),
          "l_orderkey")
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).cast("long").as("support"))
        .filter(col("support") >= 5)

    def arrayPairs(): DataFrame =
      b.groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_partkey")).as("items"))
        .select(explode(col("items")).as("pa"), col("items"))
        .select(col("pa"), explode(col("items")).as("pb"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).cast("long").as("support"))
        .filter(col("support") >= 5)

    val variants = Seq("join" -> (() => joinPairs()), "array" -> (() => arrayPairs()))
    variants.foreach { case (_, f) => f().write.format("noop").mode("overwrite").save() }
    variants.foreach { case (n, f) =>
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-8s ${ts.sorted.apply(1)}%8.3f s (median of 3)")
    }
    val a = joinPairs().collect().map(_.toString).sorted
    val c = arrayPairs().collect().map(_.toString).sorted
    println(s"identical=${a.sameElements(c)} rows=${a.length}")
    spark.stop()
  }
}
