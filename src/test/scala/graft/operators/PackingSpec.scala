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

  test("decontaminateFuzzy catches a paraphrased leak with its exact Jaccard") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val bench = Seq((1000L, base)).toDF("doc_id", "text")
    val corpusDocs = Seq(
      (1L, base + " phi"),     // near-verbatim: one appended word
      (2L, "entirely different text about query engines and shuffles"),
      (3L, "alpha beta gamma and nothing else in common")).toDF("doc_id", "text")
    val got = Dedup.decontaminateFuzzy(corpusDocs, bench, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)).toSet == Set((1L, 1000L)), got.mkString(","))
    // doc 1: 19 shingles (18 base + 1 new) vs 18 -> j = 18/19
    assert(math.abs(got.head._3 - 18.0 / 19.0) < 1e-12)
    // exact cross truth agrees (the check-face contract)
    val truth = Dedup.crossPairJaccard(corpusDocs, bench)
      .filter(col("j") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth == Set((1L, 1000L)))
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

  test("upsample: whole copies exact, fractional share hash-selected, epoch indexed") {
    val docs = (1 to 2000).map(i => (i.toLong, s"document body $i")).toDF("doc_id", "text")
    // factor 2.5: every doc twice (epochs 0,1), ~half a third time (epoch 2)
    val up = Packing.upsample(docs, lit(2.5)).cache()
    val byEpoch = up.groupBy("epoch").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byEpoch(0) == 2000 && byEpoch(1) == 2000, s"got $byEpoch")
    assert(math.abs(byEpoch(2) - 1000) < 120, s"~half expected, got ${byEpoch(2)}") // hash-uniform
    assert(byEpoch.keySet == Set(0, 1, 2))
    // epoch 0 is exactly the input; the fractional epoch is the
    // mixtureSample row set at the same threshold (shared hash idiom)
    assert(up.filter(col("epoch") === 0).select("doc_id")
      .except(docs.select("doc_id")).isEmpty)
    val frac = up.filter(col("epoch") === 2).select("doc_id")
    val mix = Packing.mixtureSample(docs, lit("8000")).select("doc_id")
    assert(frac.except(mix).isEmpty && mix.except(frac).isEmpty)
    up.unpersist()
    // factor < 1 downsamples; factor 0 drops everything; integer factor
    // has no fractional epoch
    assert(Packing.upsample(docs, lit(0.5)).groupBy("epoch").count()
      .collect().map(_.getInt(0)).toSet == Set(0))
    assert(Packing.upsample(docs, lit(0.0)).count() == 0)
    assert(Packing.upsample(docs, lit(2.0)).count() == 4000)
  }

  test("budgetTrim fills each stratum to the token budget, crossing doc kept") {
    val docs = (1 to 100).map { i =>
      (i.toLong, s"src${i % 2}", (1 to 10).map(j => s"t$j").mkString(" ")) // 10 tokens each
    }.toDF("doc_id", "source", "text")
    val kept = Packing.budgetTrim(docs, col("source"), budgetTokens = 95L)
    // 10-token docs, budget 95: pre-doc cumsum < 95 admits docs at cum 0..90
    // → exactly 10 docs per source (the 10th crosses the boundary, kept)
    val counts = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("src0" -> 10L, "src1" -> 10L), s"got $counts")
    // a budget larger than the stratum keeps everything
    assert(Packing.budgetTrim(docs, col("source"), 10000L).count() == 100)
  }

  test("quantizeInt8: max maps to ±127, zero vector to zeros, dequant error bounded") {
    val df = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0)),
      (3L, Seq(3.0))).toDF("vec_id", "v")
    val out = df.select(col("vec_id"),
        array_max(transform(col("v"), x => abs(x))).as("mx"))
      .join(df, "vec_id")
      .select(col("vec_id"), Similarity.quantizeInt8(col("v"), col("mx")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(64L, -127L, 32L, 0L)) // floor(.5*127+.5)=64
    assert(out(2L) == Seq(0L, 0L, 0L, 0L)) // zero vector guard
    assert(out(3L) == Seq(127L))
    // dequantization error ≤ scale/2 per component by construction
    val v = Seq(0.9, -0.3, 0.7071, 0.123, -0.456)
    val mx = v.map(math.abs).max
    val scale = mx / 127.0
    val q = df.sparkSession.createDataFrame(Seq((1L, v))).toDF("vec_id", "v")
      .select(Similarity.quantizeInt8(col("v"), lit(mx)).as("q"))
      .collect()(0).getSeq[Long](0)
    v.zip(q).foreach { case (x, qi) =>
      assert(math.abs(x - qi * scale) <= scale / 2 + 1e-12)
    }
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

  test("capPerStratum: equals the rank window, map-side bounded plan") {
    val docs = (1 to 300).map { i =>
      (i.toLong, s"src${i % 3}", "x" * (1 + (i * 7) % 40))
    }.toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val capped = Packing.capPerStratum(docs, col("source"), cap = 5,
      col("n_chars").cast("double"))
    // window reference: (n_chars desc, doc_id asc) is a total order so the
    // two selections must agree exactly, rank included
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val ref = docs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("source"), col("rank").cast("long"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = capped
      .select(col("stratum"), col("rank").cast("long"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
    assert(got.size == 15)
    // scale shape: selection is an aggregate (partial top-k buffers move),
    // NOT a window over the full corpus
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("curriculumPhases: matches stock ntile bit-exact on a non-divisible total") {
    // 103 rows, 5 phases: q=20, r=3 — first 3 buckets take 21, rest 20
    val docs = (1L to 103L).map(i => (i, (i * 37) % 101))
      .toDF("doc_id", "difficulty").repartition(7)
    val sort = Seq(col("difficulty").asc, col("doc_id").asc)
    val got = Packing.curriculumPhases(docs, sort, phases = 5)
      .select(col("doc_id"), col("rn"), col("phase"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.orderBy(sort: _*)
    val ref = docs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("phase", ntile(5).over(w).cast("long"))
      .select(col("doc_id"), col("rn"), col("phase"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes == Map(1L -> 21, 2L -> 21, 3L -> 21, 4L -> 20, 5L -> 20))
  }

  test("weightedSample: exact integerized A-Res selection, top-k plan not a sort") {
    val docs = (1L to 400L).map(i => (i, s"doc text $i", 1 + (i % 4).toInt))
      .toDF("doc_id", "text", "wt")
    val got = Packing.weightedSample(docs, col("wt"), k = 25)
      .select(col("doc_id"), col("skey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent reference: same key definition computed driver-side
    def key(text: String, w: Int): Long = (1 to w).map { j =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$text#$j".getBytes("UTF-8"))
      h.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xff))
    }.max
    val ref = (1L to 400L).map(i => (i, key(s"doc text $i", 1 + (i % 4).toInt)))
      .sortBy { case (id, k) => (-k, id) }.take(25)
    assert(got.toSeq == ref)
    // selection is a bounded top-k, never a global sort of the corpus
    val plan = Packing.weightedSample(docs, col("wt"), k = 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // weight monotonicity in expectation: w=4 docs out-select w=1 docs
    val wOf = (1L to 400L).map(i => i -> (1 + (i % 4).toInt)).toMap
    val picked = got.map(p => wOf(p._1))
    assert(picked.count(_ == 4) > picked.count(_ == 1))
  }

  test("weightedSample: zero/negative weights are excluded, never mis-keyed") {
    // without the w >= 1 guard, Spark's sequence(1, 0) yields a DESCENDING
    // [1, 0] array — a valid max-hash key, as if weight 2 — while DuckDB's
    // generate_series(1, 0) is empty; the guard makes both engines agree
    // that non-positive weight means "never sample"
    val docs = (1L to 50L).map(i =>
      (i, s"doc text $i", if (i % 5 == 0) 0 else if (i % 7 == 0) -3 else 1))
      .toDF("doc_id", "text", "wt")
    val got = Packing.weightedSample(docs, col("wt"), k = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = (1L to 50L).filter(i => i % 5 != 0 && i % 7 != 0).toSet
    assert(got == want,
      s"zero/negative-weight docs in the sample: ${got.diff(want)}")
  }

  test("leakFreeSplit: clusters never straddle the split; singletons split alone") {
    // 30 docs; clusters {1,2,3}, {10,11}, rest singletons
    val docs = (1L to 30L).map(i => (i, s"src${i % 2}", i * 10))
      .toDF("doc_id", "source", "n_chars")
    val cmap = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val split = Packing.leakFreeSplit(docs, cmap, testHexDigits = 4)
    val rows = split.select(col("doc_id"), col("rep"), col("split"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 30)
    // every member of a cluster carries the rep's split — no straddle
    val byRep = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    byRep.foreach { case (rep, splits) =>
      assert(splits.size == 1, s"cluster $rep straddles: $splits")
    }
    assert(rows.filter(_._1 <= 3).map(_._3).toSet.size == 1)
    // the split function is the pure md5-of-rep rule (engine-identical)
    val expected = rows.map { case (_, rep, _) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(rep.toString.getBytes("UTF-8"))
      val hex = "%02x".format(h(0) & 0xff).charAt(0)
      if ("0123".contains(hex)) "test" else "train"
    }
    assert(rows.map(_._3).sameElements(expected))
    // both sides populated at 4/16 on 28 reps
    assert(rows.map(_._3).toSet == Set("test", "train"))
  }
}
