package graft.tools

import org.apache.spark.sql.SparkSession

/** r17: how much of a face's build cost is the per-load parquet footer
  * read (schema inference) vs Catalyst analysis?
  * `runMain graft.tools.LoadProbe <sfDir>`
  */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"$sfDir/lineitem.parquet"
    val schema = spark.read.parquet(path).schema
    def time(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f) // warm
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => f)
      println(f"$tag%-22s ${(System.nanoTime() - t0) / 20e6}%8.2f ms/op")
    }
    time("read.parquet")(spark.read.parquet(path).count())
    time("read.schema.parquet")(spark.read.schema(schema).parquet(path).count())
    time("plan_only_infer") { val _ = spark.read.parquet(path).select("l_orderkey") }
    time("plan_only_schema") { val _ = spark.read.schema(schema).parquet(path).select("l_orderkey") }
    spark.stop()
  }
}
