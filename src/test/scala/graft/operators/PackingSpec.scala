package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1 to 400).map { i =>
    // token counts 1..40, deterministic text
    (i.toLong, (1 to (i % 40 + 1)).map(j => s"w$j").mkString(" "))
  }.toDF("doc_id", "text")

  test("packByTokens: bins are contiguous per shard and respect capacity+overflow") {
    val cap = 100L
    val packed = Packing.packByTokens(corpus, capacity = cap, shards = 4).cache()
    try {
      assert(packed.count() == 400) // every document assigned exactly once

      // per (shard, bin): token total stays under capacity + the overflow
      // document (greedy one-pass guarantee), and no bin is empty
      val bins = packed.groupBy("shard", "bin")
        .agg(sum("n_tokens").as("tot"), max("n_tokens").as("mx"),
          count(lit(1)).as("n"))
        .collect()
      bins.foreach { r =>
        val tot = r.getAs[Long]("tot")
        val mx = r.getAs[Long]("mx")
        assert(tot <= cap + mx,
          s"shard ${r.get(0)} bin ${r.get(1)}: $tot > cap+$mx")
      }
      // bins are numbered 0..max contiguously within each shard
      packed.groupBy("shard").agg(
        min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("nb"))
        .collect().foreach { r =>
          assert(r.getAs[Long]("lo") == 0L)
          assert(r.getAs[Long]("nb") == r.getAs[Long]("hi") + 1)
        }
      // deterministic: a second run produces the identical assignment
      val again = Packing.packByTokens(corpus, capacity = cap, shards = 4)
      assert(packed.except(again).isEmpty && again.except(packed).isEmpty)
    } finally packed.unpersist()
  }

  test("stratifiedSample: exactly n per stratum, deterministic") {
    val docs = (1 to 300).map { i =>
      (i.toLong, s"src${i % 3}", s"text body number $i")
    }.toDF("doc_id", "source", "text")
    val s1 = Packing.stratifiedSample(docs, col("source"), n = 10)
    val counts = s1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("src0" -> 10L, "src1" -> 10L, "src2" -> 10L))
    val s2 = Packing.stratifiedSample(docs, col("source"), n = 10)
    assert(s1.select("doc_id").except(s2.select("doc_id")).isEmpty)
    // asking for more than a stratum has returns the whole stratum
    val all = Packing.stratifiedSample(docs, col("source"), n = 1000)
    assert(all.count() == 300)
  }
}
