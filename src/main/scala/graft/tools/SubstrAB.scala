package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SubstrAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (form <- Seq(true, false); rep <- 1 to 3) {
      System.gc()
      val t0 = System.nanoTime()
      graft.operators.Dedup.substrDup(docs, useWindow = form)
        .write.format("noop").mode("overwrite").save()
      println(f"useWindow=$form rep $rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
