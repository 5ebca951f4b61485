package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe for the dd_editdist sf1 decomposition (r15 VERDICT #2):
  * stage timings for the exact shared-shingle candidate pipeline plus a
  * census of what AllPairs prefix filtering would cut at t=0.3. */
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
    // exploded shingles (no cap)
    val all = d
      .select(col("doc_id"), split(lower(col("text")), " +").as("__toks"))
      .select(col("doc_id"),
        explode(graft.operators.Dedup.shinglesFromToks(col("__toks")))
          .as("shingle"))
    time("explode")(all.count())
    // df-cap window
    val sh = all
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("__df") <= 1000)
    time("explode+capwindow")(sh.count())
    // co-shingle join volume (pre-aggregate row count) and pair aggregate
    val joined = sh.select(col("doc_id").as("da"), col("shingle"))
      .join(sh.select(col("doc_id").as("db"), col("shingle")), "shingle")
      .filter(col("da") < col("db"))
    time("join_volume")(joined.count())
    val inter = joined.groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    time("pair_aggregate")(inter.count())
    // full jaccard + editdist (the face)
    time("jaccard03")(graft.operators.Dedup.ngramJaccard(d, 0.3).count())
    time("editdist_face")(graft.operators.Dedup.editDistVerify(d,
      graft.operators.Dedup.ngramJaccard(d, 0.3)).count())
    // --- prefix census at t=0.3: keep each doc's (sz - ceil(t*sz) + 1)
    // LOWEST-df shingles; how much of the join volume survives?
    val t = 0.3
    val ranked = sh
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("__df"), col("shingle"))))
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("__r") <= col("__sz") - ceil(col("__sz") * t) + 1)
      .select(col("doc_id"), col("shingle"))
    time("prefix_rows")(ranked.count())
    val pjoined = ranked.select(col("doc_id").as("da"), col("shingle"))
      .join(ranked.select(col("doc_id").as("db"), col("shingle")), "shingle")
      .filter(col("da") < col("db"))
    time("prefix_join_volume")(pjoined.count())
    time("prefix_cand_distinct")(
      pjoined.select(col("da"), col("db")).distinct().count())
    spark.stop()
  }
}
