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

  test("decontaminate flags planted eval-set leakage and nothing else") {
    val bench = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val corpusDocs = Seq(
      // verbatim leak of a benchmark span (many shared 3-grams)
      (1L, "prefix words then the quick brown fox jumps over the lazy dog tonight and more"),
      // shares exactly two 3-grams ("quick brown fox", "brown fox jumps") — under minShared=3
      (2L, "a quick brown fox jumps here"),
      (3L, "completely unrelated content about databases and spark plans")).toDF("doc_id", "text")
    val flagged = Dedup.decontaminate(corpusDocs, bench, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == Set((1L, 1000L)), s"got $flagged")
    // the benchmark side is the broadcast side of the join
    val plan = Dedup.decontaminate(corpusDocs, bench).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("mixtureSample keeps a deterministic per-threshold fraction") {
    val docs = (1 to 2000).map(i => (i.toLong, s"document body $i")).toDF("doc_id", "text")
    val half = Packing.mixtureSample(docs, lit("8000")).count()
    assert(math.abs(half - 1000) < 120, s"~half expected, got $half") // hash-uniform
    val none = Packing.mixtureSample(docs, lit("0000")).count()
    assert(none == 0)
    // deterministic: same rows both times
    val a = Packing.mixtureSample(docs, lit("4000")).select("doc_id")
    val b = Packing.mixtureSample(docs, lit("4000")).select("doc_id")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
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
