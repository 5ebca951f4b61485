package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the physical plan of an xlsx scan — confirms the batch path is
  * columnar (ColumnarToRow above the BatchScan) and pushdown survives.
  * Run: sbt "runMain graft.tools.ScanPlanProbe"
  */
object ScanPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_probe", "lineitem_single")
    val xlsx = {
      val l = java.nio.file.Files.list(out)
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.toString).filter(_.endsWith(".xlsx")).toSeq.sorted.head
      } finally l.close()
    }
    val df = spark.read.format("xlsx").option("threads", "4").load(xlsx)
    df.explain("formatted")
    val filtered = df.filter("l_quantity > 25").select("l_orderkey", "l_quantity")
    filtered.explain("formatted")
    println(s"filtered count: ${filtered.count()}")
    spark.stop()
  }
}
