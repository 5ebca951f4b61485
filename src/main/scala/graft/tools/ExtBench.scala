package graft.tools
import org.apache.spark.sql.SparkSession
object ExtBench {
  def main(args: Array[String]): Unit = {
    val useExt = args.headOption.contains("ext")
    val faces = args.drop(1)
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (useExt)
      b.config("spark.sql.extensions", "graft.functions.GraftExtensions")
    else b).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    faces.foreach { f =>
      // warm with a FULL execution (r14 ADVICE: planning alone leaves t1
      // a cold run — first-touch I/O, codegen, one-time index builds)
      graft.SparkEntry.queries(f)(spark, dir).count()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(f)(spark, dir).count()
      val t1 = System.nanoTime()
      val t0b = System.nanoTime()
      graft.SparkEntry.queries(f)(spark, dir).count()
      val t1b = System.nanoTime()
      println(f"EXTBENCH $f ext=$useExt rows=$n t1=${(t1 - t0) / 1e9}%.2f t2=${(t1b - t0b) / 1e9}%.2f")
    }
  }
}
