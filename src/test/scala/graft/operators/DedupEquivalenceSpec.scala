package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins the array-carrying ngramJaccard plan (r15 VERDICT #2: the sf1
  * pair-aggregate replan) BIT-IDENTICAL to the groupBy-count spelling it
  * replaced (`ngramJaccardGrouped`, the executable spec) — pair set AND
  * the double `j` values, across thresholds, the DF cap, duplicate-heavy
  * corpora and word-soup fuzz. The cross-engine leg is the dd_editdist /
  * dd_ngram_jaccard full oracles. */
class DedupEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def assertSame(docs: DataFrame, threshold: Double,
      maxDf: Long = 1000L): Unit = {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("j"))))
      .sortBy(x => (x._1, x._2)).toSeq
    val fast = rows(Dedup.ngramJaccard(docs, threshold, maxDf))
    val spec = rows(Dedup.ngramJaccardGrouped(docs, threshold, maxDf))
    assert(fast == spec,
      s"t=$threshold maxDf=$maxDf: ${fast.size} vs ${spec.size} pairs")
  }

  private def wordSoup(n: Int, vocab: Int, len: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val words = Seq.fill(3 + rnd.nextInt(len))(s"w${rnd.nextInt(vocab)}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private val gateKey = "spark.graft.jaccard.collapseMaxDistinctRatio"
  private def forcingCollapse[A](f: => A): A = {
    spark.conf.set(gateKey, "1.0")
    try f finally spark.conf.unset(gateKey)
  }

  test("fuzz corpora: pair set and j bits identical across thresholds, " +
      "collapse FORCED (the low-duplication hard case for exactness)") {
    forcingCollapse {
      // small vocab => dense co-shingles; large => sparse; both fuzzed
      for ((vocab, seed) <- Seq((12, 1L), (60, 2L), (300, 3L))) {
        val docs = wordSoup(80, vocab, 12, seed)
        for (t <- Seq(0.2, 0.3, 0.6, 0.9)) assertSame(docs, t)
      }
    }
  }

  test("duplicate-heavy corpus (identical block + near-dups) identical, " +
      "with and without the DF cap") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ((0 until 50).map(i => (i.toLong, base)) ++
      Seq(50L -> base.replace("gamma", "mu"),
        51L -> base.replace("kappa", "nu"),
        52L -> "totally different words here entirely unrelated content"))
      .toDF("doc_id", "text")
    assertSame(docs, 0.5, maxDf = 1000L)
    assertSame(docs, 0.5, maxDf = 10L)
    assertSame(docs, 0.5, maxDf = 0L) // cap disabled
  }

  test("full 64-bit doc_id domain: crossPairJaccard-style offset ids pair " +
      "identically (no packing assumption)") {
    val docs = Seq((1L << 40, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      ((1L << 40) + 1, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    forcingCollapse { assertSame(docs, 0.3) }
  }

  test("weighted-df cap: duplicates count as documents, not distinct texts " +
      "(the cap boundary must not move under collapse)") {
    // one shingle shared by 12 DOCS across 3 distinct texts: cap 10
    // removes it in both spellings (12 > 10 even though 3 texts <= 10)
    val base = "shared shingle words here"
    val docs = ((0 until 6).map(i => (i.toLong, base)) ++
      (6 until 12).map(i => (i.toLong, base + " tailA")) :+
      (12L, "unrelated other content words")).toDF("doc_id", "text")
    assertSame(docs, 0.1, maxDf = 10L)
    assertSame(docs, 0.1, maxDf = 12L)
    assertSame(docs, 0.1, maxDf = 11L)
  }

  private def assertSameContainment(docs: DataFrame, t: Double): Unit = {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("c")),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("j"))))
      .sortBy(x => (x._1, x._2)).toSeq
    val fast = rows(Dedup.ngramContainment(docs, t))
    val spec = rows(Dedup.ngramContainmentGrouped(docs, t))
    assert(fast == spec, s"t=$t: ${fast.size} vs ${spec.size} pairs")
  }

  test("containment: collapse == direct, c and j bits identical " +
      "(forced collapse fuzz + dup-heavy + quoted-short-doc)") {
    forcingCollapse {
      for ((vocab, seed) <- Seq((15, 21L), (90, 22L)))
        assertSameContainment(wordSoup(60, vocab, 10, seed), 0.7)
    }
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dupHeavy = ((0 until 30).map(i => (i.toLong, base)) ++ Seq(
      30L -> "alpha beta gamma delta epsilon", // quoted prefix: contained
      31L -> "unrelated other words entirely here"))
      .toDF("doc_id", "text")
    assertSameContainment(dupHeavy, 0.9)
    assertSameContainment(dupHeavy, 0.5)
  }

  private def assertSameEditDist(docs: DataFrame, threshold: Double): Unit = {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Int]("dist")))
      .sortBy(x => (x._1, x._2)).toSeq
    val fused = rows(Dedup.editDistNearDup(docs, threshold))
    val spec = rows(Dedup.editDistVerify(docs,
      Dedup.ngramJaccardGrouped(docs, threshold)))
    assert(fused == spec, s"t=$threshold: ${fused.size} vs ${spec.size}")
  }

  test("editDistNearDup == editDistVerify over the direct candidate " +
      "spelling: fuzz (collapse forced) + duplicate-heavy corpora") {
    forcingCollapse {
      for ((vocab, seed) <- Seq((12, 11L), (80, 12L)))
        assertSameEditDist(wordSoup(60, vocab, 12, seed), 0.3)
    }
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dupHeavy = ((0 until 40).map(i => (i.toLong, base)) ++
      Seq(40L -> (base + " extra tail words appended here"),
        41L -> base.replace("gamma", "mu"),
        42L -> "totally different words entirely"))
      .toDF("doc_id", "text")
    assertSameEditDist(dupHeavy, 0.3)
    assertSameEditDist(dupHeavy, 0.9)
  }

  test("short-doc edge: sub-3-token docs shingle to the whole text and " +
      "still pair identically") {
    val docs = Seq(1L -> "one two", 2L -> "one two", 3L -> "one",
      4L -> "one two three four", 5L -> "", 6L -> " ")
      .toDF("doc_id", "text")
    forcingCollapse { for (t <- Seq(0.1, 0.5, 1.0)) assertSame(docs, t) }
  }

  test("NULL-text duplicates: collapse == direct for jaccard AND the " +
      "editDist stage drops NULL pairs on BOTH paths (r16 ADVICE medium)") {
    // >=2 NULL texts: they share the "" shingle, so jaccard pairs them
    // (both spellings); the distance stage's NULL prefix rejects them
    // (both spellings). The collapsed editDist branch used to emit the
    // within-NULL-group pair as dist=0.
    val base = "alpha beta gamma delta epsilon zeta"
    val docs = (Seq(1L -> base, 2L -> base, 3L -> (base + " tail"),
      4L -> null.asInstanceOf[String], 5L -> null.asInstanceOf[String],
      6L -> null.asInstanceOf[String], 7L -> "other words entirely"))
      .toDF("doc_id", "text")
    forcingCollapse {
      assertSame(docs, 0.3)
      assertSameEditDist(docs, 0.3)
    }
    // and with the gate deciding on its own (dup mass forces collapse)
    assertSameEditDist(docs, 0.3)
  }

  private def assertSameLsh(docs: DataFrame, threshold: Double,
      maxBucketDf: Long = 1000L): Unit = {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("j"))))
      .sortBy(x => (x._1, x._2)).toSeq
    val fast = rows(Dedup.minhashLsh(docs, threshold = threshold,
      maxBucketDf = maxBucketDf))
    val spec = rows(Dedup.minhashLshDirect(docs, threshold = threshold,
      maxBucketDf = maxBucketDf))
    assert(fast == spec,
      s"lsh t=$threshold cap=$maxBucketDf: ${fast.size} vs ${spec.size} pairs")
  }

  test("minhashLsh: collapse == direct (forced-collapse fuzz + dup-heavy " +
      "+ NULL-text dups + weighted bucket cap + cap disabled)") {
    forcingCollapse {
      for ((vocab, seed) <- Seq((12, 41L), (80, 42L))) {
        val docs = wordSoup(60, vocab, 12, seed)
        for (t <- Seq(0.2, 0.6)) assertSameLsh(docs, t)
      }
    }
    // dup-heavy: identical block (collides in every band), near-dups,
    // NULL-text dups (pair at j=1.0 via the "" shingle in BOTH
    // spellings — minhash differs from editDist here), and a bucket cap
    // small enough that the identical block's WEIGHTED df crosses it
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ((0 until 30).map(i => (i.toLong, base)) ++ Seq(
      30L -> base.replace("gamma", "mu"), 31L -> base.replace("zeta", "xi"),
      32L -> null.asInstanceOf[String], 33L -> null.asInstanceOf[String],
      34L -> "unrelated other words entirely different content"))
      .toDF("doc_id", "text")
    assertSameLsh(docs, 0.5)
    assertSameLsh(docs, 0.5, maxBucketDf = 10L) // 30 identical docs > 10
    assertSameLsh(docs, 0.5, maxBucketDf = 0L)  // cap disabled
    assertSameLsh(docs, 1.0)
    forcingCollapse { assertSameLsh(docs, 0.5, maxBucketDf = 10L) }
  }

  private def assertSameDelta(all: DataFrame, deltaIds: DataFrame,
      threshold: Double, maxDf: Long = 1000L): Unit = {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("j"))))
      .sortBy(x => (x._1, x._2)).toSeq
    val fast = rows(Dedup.ngramJaccardDelta(all, deltaIds, threshold, maxDf))
    val spec = rows(Dedup.ngramJaccardDeltaDirect(all, deltaIds, threshold, maxDf))
    assert(fast == spec,
      s"delta t=$threshold maxDf=$maxDf: ${fast.size} vs ${spec.size} pairs")
  }

  test("ngramJaccardDelta: collapse == direct (forced-collapse fuzz + " +
      "dup-heavy + NULL texts + delta/standing dup mixes + df cap)") {
    forcingCollapse {
      for ((vocab, seed) <- Seq((12, 31L), (80, 32L))) {
        val docs = wordSoup(60, vocab, 12, seed)
        val delta = docs.filter($"doc_id" % 5 === 0).select("doc_id")
        for (t <- Seq(0.2, 0.6)) assertSameDelta(docs, delta, t)
      }
    }
    // dup-heavy: delta docs duplicating standing docs, delta-delta dups,
    // a NULL-text delta duplicating a NULL-text standing doc
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = ((0 until 20).map(i => (i.toLong, base)) ++ Seq(
      20L -> (base + " tail"), 21L -> base.replace("gamma", "mu"),
      22L -> null.asInstanceOf[String], 23L -> null.asInstanceOf[String],
      24L -> "standing unrelated words here",
      25L -> base, 26L -> base, // delta duplicating standing
      27L -> null.asInstanceOf[String], // delta NULL duplicating standing NULL
      28L -> "fresh delta content words entirely new"))
      .toDF("doc_id", "text")
    val delta = docs.filter($"doc_id" >= 25L).select("doc_id")
    assertSameDelta(docs, delta, 0.5)
    assertSameDelta(docs, delta, 0.5, maxDf = 10L)
    assertSameDelta(docs, delta, 1.0)
    forcingCollapse { assertSameDelta(docs, delta, 0.5) }
  }
}
