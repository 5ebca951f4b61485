package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off runner: evaluate named SparkEntry queries on a SF dir and print
  * their rows — spot-check a query/oracle pair without a full Verify pass.
  * Run: sbt "runMain graft.tools.QuickCheck q_approx_distinct [more...]"
  */
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"=== $name ===")
      df.orderBy(df.columns.head).show(50, truncate = false)
    }
    spark.stop()
  }
}
