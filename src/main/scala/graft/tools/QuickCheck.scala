package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off runner: evaluate named SparkEntry queries on a SF dir and print
  * their rows — spot-check a query/oracle pair without a full Verify pass.
  * Run: sbt "runMain graft.tools.QuickCheck q_approx_distinct [more...]"
  * Timing mode (Bench-shaped: noop sink, warmup + reps):
  *      sbt "runMain graft.tools.QuickCheck --time 5 xlsx_ingest_single"
  */
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (names, reps) =
      if (args.length >= 2 && args(0) == "--time") (args.drop(2), args(1).toInt)
      else (args, 0)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (reps > 0) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
        for (i <- 1 to reps) {
          System.gc()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"$name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      } else {
        val df = fn(spark, sfDir)
        println(s"=== $name ===")
        df.orderBy(df.columns.head).show(50, truncate = false)
      }
    }
    spark.stop()
  }
}
