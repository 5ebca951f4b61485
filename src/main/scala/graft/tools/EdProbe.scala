package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the dd_editdist sf1 decomposition (r15 item 6). */
object EdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.Tables.load(spark, dir, "documents")
    d.cache().count()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"EDPROBE $tag n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // full ngramJaccard at 0.3
    time("jaccard03")(graft.operators.Dedup.ngramJaccard(d, 0.3).count())
    time("jaccard03_again")(graft.operators.Dedup.ngramJaccard(d, 0.3).count())
    // DF-cap window only
    time("shingles")(d.select(explode(split(lower(col("text")), " +"))).count())
    // pairs without the sizes joins: stop after the pair aggregate
    val pairs = graft.operators.Dedup.ngramJaccard(d, 0.3)
    time("editdist_full")(
      graft.operators.Dedup.editDistVerify(d, pairs).count())
    spark.stop()
  }
}
