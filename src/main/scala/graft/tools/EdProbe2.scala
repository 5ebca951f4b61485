package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the ngramJaccard adaptive collapse (r15 VERDICT #2):
  * times the direct (grouped) spelling against the gated operator and
  * the fused editDistNearDup face on one SF dir. The r16 numbers this
  * pinned: sf1 dd_editdist 27.6 -> ~7 s (collapse), sf0.1 parity
  * (gate picks direct). Run:
  *   sbt "runMain graft.tools.EdProbe2 /root/repo/target/sf1"
  */
object EdProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.Tables.load(spark, dir, "documents")
    d.cache().count()
    def time(tag: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime(); val n = f
      println(f"EDPROBE2 $tag n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    graft.operators.Dedup.ngramJaccard(d, 0.6).count()
    graft.operators.Dedup.ngramJaccardGrouped(d, 0.6).count()
    for (i <- 1 to 2) {
      time(s"old06_$i")(graft.operators.Dedup.ngramJaccardGrouped(d, 0.6).count())
      time(s"new06_$i")(graft.operators.Dedup.ngramJaccard(d, 0.6).count())
      time(s"oldface_$i")(graft.operators.Dedup.editDistVerify(d,
        graft.operators.Dedup.ngramJaccardGrouped(d, 0.3)).count())
      time(s"newface_$i")(graft.operators.Dedup.editDistNearDup(d, 0.3).count())
    }
    spark.stop()
  }
}
