package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r17 microbench (guide §1/§4): where does the statistics tier's
  * single-task CPU go — the double→decimal CAST or the non-compact
  * DECIMAL(28,4) sum? Variants over the same 600k-row lineitem scan.
  *
  * `runMain graft.tools.DecProbe <sfDir>`
  */
object DecProbe {
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
    val d284 = DecimalType(28, 4)
    val d184 = DecimalType(18, 4)
    def li = graft.Tables.load(spark, sfDir, "lineitem")
    val q = col("l_quantity"); val p = col("l_extendedprice")
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "count_only" -> (() => li.agg(count(lit(1)))),
      "sum_double_x5" -> (() => li.agg(sum(q), sum(p), sum(q * q), sum(p * p), sum(q * p))),
      "sum_d284_x1" -> (() => li.agg(sum(q.cast(d284)))),
      "sum_d184_x1" -> (() => li.agg(sum(q.cast(d184)))),
      "cast_d284_nosum" -> (() => li.agg(max(q.cast(d284)))),
      "sum_d284_x5" -> (() => li.agg(sum(q.cast(d284)), sum(p.cast(d284)),
        sum((q * q).cast(d284)), sum((p * p).cast(d284)), sum((q * p).cast(d284)))),
      "sum_d184_x5" -> (() => li.agg(sum(q.cast(d184)), sum(p.cast(d184)),
        sum((q * q).cast(d184)), sum((p * p).cast(d184)), sum((q * p).cast(d184)))),
      "int128_x5" -> (() => {
        import graft.functions.GraftFunctions.sum_dec_exact
        li.agg(sum_dec_exact(q, 4), sum_dec_exact(p, 4),
          sum_dec_exact(q * q, 4), sum_dec_exact(p * p, 4),
          sum_dec_exact(q * p, 4))
      }),
      "int128_x5_grouped" -> (() => {
        import graft.functions.GraftFunctions.sum_dec_exact
        li.groupBy(col("l_returnflag")).agg(sum_dec_exact(q, 4),
          sum_dec_exact(p, 4), sum_dec_exact(q * q, 4),
          sum_dec_exact(p * p, 4), sum_dec_exact(q * p, 4))
      }),
      "d284_x5_grouped" -> (() => li.groupBy(col("l_returnflag"))
        .agg(sum(q.cast(d284)), sum(p.cast(d284)), sum((q * q).cast(d284)),
          sum((p * p).cast(d284)), sum((q * p).cast(d284)))),
      "int128_proj_x5" -> (() => {
        import org.apache.spark.sql.graftbridge.ColumnBridge
        def u(c: org.apache.spark.sql.Column) = ColumnBridge.column(
          graft.functions.UnscaledLong(ColumnBridge.expression(c.cast(d184))))
        def s128(c: org.apache.spark.sql.Column) = ColumnBridge.column(
          graft.functions.Int128SumAgg(ColumnBridge.expression(c), 4)
            .toAggregateExpression())
        li.select(u(q).as("u1"), u(p).as("u2"), u(q * q).as("u3"),
          u(p * p).as("u4"), u(q * p).as("u5"))
          .agg(s128(col("u1")), s128(col("u2")), s128(col("u3")),
            s128(col("u4")), s128(col("u5")))
      })
    )
    variants.foreach { case (_, f) => f().write.format("noop").mode("overwrite").save() }
    variants.foreach { case (n, f) =>
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-18s ${ts.sorted.apply(1)}%8.3f s (median of 3)")
    }
    // value identity check: d184 vs d284 sums
    val a = li.agg(sum(q.cast(d284)).cast("double"), sum(p.cast(d284)).cast("double"),
      sum((q * q).cast(d284)).cast("double"), sum((p * p).cast(d284)).cast("double"),
      sum((q * p).cast(d284)).cast("double")).collect()(0)
    val b = li.agg(sum(q.cast(d184)).cast("double"), sum(p.cast(d184)).cast("double"),
      sum((q * q).cast(d184)).cast("double"), sum((p * p).cast(d184)).cast("double"),
      sum((q * p).cast(d184)).cast("double")).collect()(0)
    println(s"identical=${a == b}\n  d284=$a\n  d184=$b")
    spark.stop()
  }
}
