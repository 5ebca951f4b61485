package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** One-off: inspect scan metrics for z-order pruning experiments. */
object ZProbe {
  private def findScans(plan: SparkPlan): Seq[FileSourceScanExec] = plan match {
    case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(findScans)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_partkey"), col("l_orderkey"), col("l_quantity"))
    val root = java.nio.file.Files.createTempDirectory("graft_zprobe_")
    val zPath = root.resolve("z").toString
    val linPath = root.resolve("lin").toString
    graft.operators.Layout.writeZordered2(li, "l_partkey", "l_orderkey", 256, zPath)
    li.repartitionByRange(256, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(linPath)
    val b = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_orderkey"), max("l_orderkey")).collect()(0)
    def mid(lo: Long, hi: Long, pct: Int): (Long, Long) = {
      val span = hi - lo
      (lo + span * (50 - pct / 2) / 100, lo + span * (50 + pct / 2) / 100)
    }
    val (p1, p2) = mid(b.getLong(0), b.getLong(1), 10)
    val (s1, s2) = mid(b.getLong(2), b.getLong(3), 10)
    println(s"box partkey [$p1,$p2] orderkey [$s1,$s2]  total=${li.count()}")
    for ((label, path) <- Seq("z" -> zPath, "lin" -> linPath)) {
      val df = spark.read.parquet(path).filter(
        col("l_partkey").between(p1, p2) && col("l_orderkey").between(s1, s2))
      val n = df.count()
      df.collect()
      val scans = findScans(df.queryExecution.executedPlan)
      val m = scans.map(s => s.metrics.map { case (k, v) => k -> v.value })
      println(s"$label: matches=$n scans=${scans.size} metrics=$m")
    }
    spark.stop()
  }
}
