package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

object MmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val docs = graft.Tables.load(spark, dir, "documents")
      val blobs = Multimodal.syntheticVariantPngBlobs(spark, docs)
      val pairs = Multimodal.phashNearDup(spark, blobs, maxHamming = 5, nBlocks = 8)
        .select(col("da"), col("db"))
      val n = pairs.count()
      // cross-group pairs: different doc_id div 4
      val cross = pairs.filter(expr("da div 4 != db div 4")).count()
      // within-group pairs found vs expected C(4,2)*ngroups
      val within = n - cross
      val nImgs = blobs.count()
      val expected = (nImgs / 4) * 6
      println(s"$dir: imgs=$nImgs pairs=$n within=$within cross=$cross expectedWithin=$expected recall=${within.toDouble/expected}")
    }
    spark.stop()
  }
}
