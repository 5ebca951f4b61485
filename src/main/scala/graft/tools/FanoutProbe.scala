package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r17 experiment (guide §2.4/§1.2): the sf parquet inputs are single
  * row-group files, so every scan stage is one task and post-scan compute
  * is serial. Measures whether a round-robin repartition right after the
  * scan (one small exchange buying full-core parallelism for the heavy
  * expression work) pays, and at which width.
  *
  * `runMain graft.tools.FanoutProbe <sfDir>`
  */
object FanoutProbe {
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
    import spark.implicits._
    def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
    def dec4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

    def q01(li: DataFrame): DataFrame =
      li.filter($"l_shipdate" <= "1998-09-02 00:00:00")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec2($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec2($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec4($"l_extendedprice" * (lit(1.0) - $"l_discount"))).cast("double").as("sum_disc_price"),
          (sum(dec2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))

    def load() = graft.Tables.load(spark, sfDir, "lineitem")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q01_asis" -> (() => q01(load())),
      "q01_rr32" -> (() => q01(load().repartition(32))),
      "q01_rr8" -> (() => q01(load().repartition(8))),
      "q01_rr32_proj" -> (() => q01(load().select("l_shipdate", "l_returnflag",
        "l_linestatus", "l_quantity", "l_extendedprice", "l_discount").repartition(32)))
    )
    variants.foreach { case (_, f) => f().write.format("noop").mode("overwrite").save() }
    variants.foreach { case (n, f) =>
      (1 to 3).foreach { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        println(f"$n%-16s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
    }
    spark.stop()
  }
}
