package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probes for exact substring dedup.
  *  - corpus: both count forms (join vs window) on sf0.1 documents.
  *  - longdoc: fused StrideWinHashes vs the composed
  *    transform(substring)+xxhash64 window extraction on synthetic long
  *    docs — the composed form's char-substring re-seeks boundaries from
  *    the string start, paying O(len²/stride) per doc. */
object SubstrAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = args.headOption.getOrElse("corpus")
    if (mode == "corpus") {
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      for (form <- Seq(true, false); rep <- 1 to 3) {
        System.gc()
        val t0 = System.nanoTime()
        graft.operators.Dedup.substrDup(docs, useWindow = form)
          .write.format("noop").mode("overwrite").save()
        println(f"useWindow=$form rep $rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    } else {
      // 512 docs × ~100 KB: long enough that quadratic extraction dominates
      import spark.implicits._
      val chunk = "the quick brown fox jumps över the lazy dög %08d "
      val docs = spark.range(512).map { i =>
        val sb = new StringBuilder(102000)
        var j = 0
        while (sb.length < 100000) { sb.append(chunk.format(i * 7919 + j)); j += 1 }
        (i, sb.toString)
      }.toDF("doc_id", "text").cache()
      docs.count()
      val w = 40; val stride = 10
      for (rep <- 1 to 3) {
        System.gc()
        var t0 = System.nanoTime()
        docs.select(explode(graft.functions.GraftFunctions
          .stride_win_hashes(col("text"), w, stride)).as("h"))
          .write.format("noop").mode("overwrite").save()
        val fused = (System.nanoTime() - t0) / 1e9
        System.gc()
        t0 = System.nanoTime()
        docs.filter(length(col("text")) >= w)
          .select(explode(transform(
            sequence(lit(0), floor((length(col("text")) - w) / stride).cast("int")),
            i => xxhash64(substring(col("text"), lit(1) + i * stride, lit(w))))).as("h"))
          .write.format("noop").mode("overwrite").save()
        val composed = (System.nanoTime() - t0) / 1e9
        println(f"rep $rep: fused $fused%.3f s, composed $composed%.3f s, " +
          f"speedup ${composed / fused}%.1fx")
      }
    }
    spark.stop()
  }
}
