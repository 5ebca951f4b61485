package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r18: same-JVM A/B of the Apriori-pruned basket spellings vs the r17
  * unpruned ones, with an output-identity check.
  * `runMain graft.tools.Basket2Probe <sfDir>` */
object Basket2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def b = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()

    def pairsOf(bb: DataFrame): DataFrame =
      bb.select(col("l_orderkey"), col("l_partkey").as("pa"))
        .join(bb.select(col("l_orderkey"), col("l_partkey").as("pb")),
          "l_orderkey")
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).cast("long").as("support"))
        .filter(col("support") >= 5)

    def pruned(bb: DataFrame): DataFrame = {
      val freq = bb.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("__sup")).filter(col("__sup") >= 5)
        .select(col("l_partkey"))
      bb.join(freq, Seq("l_partkey"), "left_semi")
    }

    def pairsOld(): DataFrame = pairsOf(b)
    def pairsNew(): DataFrame = pairsOf(pruned(b))

    val variants = Seq(
      "pairs_old" -> (() => pairsOld()),
      "pairs_new" -> (() => pairsNew()))
    variants.foreach { case (_, f) => f().write.format("noop").mode("overwrite").save() }
    variants.foreach { case (n, f) =>
      val ts = (1 to 5).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-10s ${ts.sorted.apply(2)}%8.3f s (median of 5) ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    val a = pairsOld().collect().map(_.toString).sorted
    val c = pairsNew().collect().map(_.toString).sorted
    println(s"identical=${a.sameElements(c)} rows=${a.length}")
    // how selective is the prune?
    val nb = b.count(); val nf = pruned(b).count()
    println(s"basket_rows=$nb pruned_rows=$nf")
    spark.stop()
  }
}
