package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic-property specs for the dedup family (SURVEY.md §2.3 #36-40):
  * planted duplicates must be found, and no operator may fall back to a
  * cartesian pair space.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill"
  private val corpus: DataFrame = docsDF(
    Seq(
      1L -> base,
      2L -> base, // exact duplicate of 1
      3L -> base.replace("lazy", "sleepy"), // near-dup of 1
      4L -> "completely different content about spark shuffles and partitions and codegen",
      5L -> "yet another unrelated document mentioning catalyst optimizer rules and pushdown",
      6L -> base.replace("warm", "cold").replace("cat", "kitten") // near-dup
    ))

  test("exact dedup groups identical content, keeps min doc_id") {
    val out = Dedup.exact(corpus).collect()
    assert(out.length == 5) // 6 docs, one exact pair collapsed
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
  }

  test("ngram Jaccard finds planted near-dups and skips unrelated docs") {
    val pairs = Dedup.ngramJaccard(corpus, 0.5).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L || a == 5L || b == 5L })
  }

  test("containment catches a quoted short doc that Jaccard misses") {
    // doc 8 is doc 7's first third verbatim: containment 1.0, Jaccard low
    val long = base + " and then it recounts the entire history of the " +
      "garden in long winding sentences about seasons weather soil and light"
    val short = long.split(" ").take(12).mkString(" ")
    val c = docsDF(Seq(7L -> long, 8L -> short,
      9L -> "wholly unrelated text about broadcast joins and bucketed tables"))
    val contained = Dedup.ngramContainment(c, 0.9).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(contained == Set((7L, 8L)))
    // the symmetric detector at its production threshold does NOT see it
    val jac = Dedup.ngramJaccard(c, 0.6).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(!jac.contains((7L, 8L)))
    // emitted metrics agree with the asymmetry: c = 1.0, j well below
    val row = Dedup.ngramContainment(c, 0.9).collect()
      .find(r => r.getAs[Long]("da") == 7L).get
    assert(row.getAs[Double]("c") == 1.0)
    assert(row.getAs[Double]("j") < 0.6)
  }

  test("minhashEstimate: exact dups estimate exactly 1.0; fractional-j " +
      "near-dups get a FRACTIONAL estimate near j (degeneracy guard)") {
    val est = Dedup.minhashEstimate(corpus).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        r.getAs[Double]("j_est")).toMap
    // docs 1 and 2 are exact duplicates: every signature position agrees
    assert(est((1L, 2L)) == 1.0)
    // (1,3)/(2,3) are near-dups with fractional exact j — under the
    // pre-r17 order-preserving family the agreement estimate was binary
    // {0,1}; the repaired family must place it strictly inside (0,1) and
    // within estimator noise of the exact value (k=32 ⇒ σ ≤ 0.089; 3σ)
    val exactJ = Dedup.ngramJaccard(corpus, 0.0).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        r.getAs[Double]("j")).toMap
    for (p <- Seq((1L, 3L), (2L, 3L)); e <- est.get(p)) {
      assert(e > 0.0 && e < 1.0, s"$p estimate $e still binary")
      assert(math.abs(e - exactJ(p)) <= 0.27,
        s"$p estimate $e vs exact ${exactJ(p)}")
    }
    assert(est.contains((1L, 3L)) || est.contains((2L, 3L)),
      "no fractional candidate pair surfaced to test the estimator")
  }

  test("minhash LSH recall >= 0.9 vs exact ngram Jaccard, no cartesian join") {
    val lsh = Dedup.minhashLsh(corpus, bands = 8, rowsPerBand = 4, threshold = 0.5)
    val exact = Dedup.ngramJaccard(corpus, 0.5).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    val found = lsh.collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(exact.nonEmpty)
    val recall = found.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall; exact=$exact found=$found")
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "LSH must not plan a cartesian product")
  }

  test("minhash LSH output is a verified subset of exact ngram Jaccard on real corpus") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val exact = Dedup.ngramJaccard(docs, 0.6).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    val lsh = Dedup.minhashLsh(docs, threshold = 0.6).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    // every LSH pair is exact-verified, so it must appear in the exact set
    assert(lsh.subsetOf(exact), s"LSH emitted unverified pairs: ${lsh -- exact}")
    // and on the planted near-dups, recall should be high
    if (exact.nonEmpty) {
      val recall = lsh.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.8, s"recall $recall on ${exact.size} true pairs")
    }
  }

  test("hot-shingle DF cap bounds candidate pairs on a boilerplate corpus") {
    // adversarial corpus: every doc shares the same boilerplate header, so
    // without a cap every doc pairs with every other doc (n² candidates)
    val boiler = "this document is provided as is without warranty of any kind either express"
    val n = 60
    val adv = docsDF((0 until n).map { i =>
      val unique =
        if (i == 1) s"unique payload content item ${i - 1} alpha beta gamma delta epsilon zeta"
        else s"unique payload content item $i alpha beta gamma delta epsilon zeta"
      (i.toLong, s"$boiler $unique")
    })
    // threshold 0 surfaces EVERY candidate pair the join generates
    val uncapped = Dedup.ngramJaccard(adv, threshold = 0.0, maxShingleDf = 0).count()
    val capped = Dedup.ngramJaccard(adv, threshold = 0.0, maxShingleDf = 10).count()
    assert(uncapped == n.toLong * (n - 1) / 2, s"boilerplate => all pairs, got $uncapped")
    // with the cap the boilerplate shingles drop; only docs sharing
    // sub-cap shingles remain candidates (docs 0/1 share their payload)
    assert(capped < 10, s"capped candidates should collapse, got $capped")
    val pairs = Dedup.ngramJaccard(adv, threshold = 0.5, maxShingleDf = 10).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(pairs.contains((0L, 1L)), s"planted near-dup must survive the cap: $pairs")
  }

  test("simhash: identical docs at hamming 0, near-dups within 3 bits") {
    val out = Dedup.simhashNearDup(corpus, maxHamming = 3).collect()
      .map(r => ((r.getAs[Long]("da"), r.getAs[Long]("db")), r.getAs[Int]("hamming").toLong))
      .toMap
    assert(out((1L, 2L)) == 0L)
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("multi-table simhash yields the identical verified pair set across nBlocks") {
    val docs = graft.Tables.load(spark, sf, "documents")
    def pairs(nBlocks: Int): Set[(Long, Long)] =
      Dedup.simhashNearDup(docs, maxHamming = 3, nBlocks = nBlocks).collect()
        .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    val legacy = pairs(4) // single-16-bit-block tables (the r2 shape)
    val six = pairs(6) // 20 tables keyed on 32-bit block combinations
    val eight = pairs(8) // 56 tables keyed on 40-bit combinations
    assert(six == legacy, s"nBlocks=6 diverged: ${six.diff(legacy)} / ${legacy.diff(six)}")
    assert(eight == legacy, s"nBlocks=8 diverged: ${eight.diff(legacy)} / ${legacy.diff(eight)}")
  }

  test("embedding near-dup finds planted perturbed vectors, not random ones") {
    val dim = 16
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 31 + j * 17) % 97) - 48).toFloat / 48f)
    val planted = vec(1).zipWithIndex.map { case (x, j) => x + (if (j == 0) 0.01f else 0f) }
    val emb = Seq(
      (1L, vec(1)), (2L, planted), // planted near-dup pair (cos ~ 1)
      (3L, vec(7)), (4L, vec(13)), (5L, vec(29)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embedNearDup(emb, threshold = 0.99, nBits = 4, dim = dim).collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("connectedComponents: chains, stars and singleton pairs get min-id clusters") {
    // components: chain {1,2,3}, pair {5,6}, star {10,11,12,13}
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (5L, 6L),
      (10L, 11L), (10L, 12L), (10L, 13L)).toDF("da", "db")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(cc == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L), s"got $cc")
    // a longer chain exercises multi-round propagation (diameter 6)
    val chain = (20L until 26L).map(i => (i, i + 1)).toDF("da", "db")
    val cc2 = Dedup.connectedComponents(chain).collect()
      .map(r => r.getAs[Long]("cluster_id")).distinct
    assert(cc2.toSeq == Seq(20L), s"chain should collapse to one cluster, got $cc2")
  }

  test("connectedComponents: pointer jumping converges a 256-chain in <= log2 rounds") {
    // The path-doubling round grows the reachable window as 2^r - 1, so a
    // 256-node chain (diameter 255) must finish within 8 rounds plus the
    // final no-change round even when hash partitioning scatters its edges;
    // maxIter = 9 REFUSES (throws) if convergence is any slower — this is
    // the spec that distinguishes star-contraction convergence from plain
    // O(diameter) label propagation.
    val chain = (1000L until 1255L).map(i => (i, i + 1)).toDF("da", "db")
      .repartition(8)
    val cc = Dedup.connectedComponents(chain, maxIter = 9).collect()
      .map(r => r.getAs[Long]("cluster_id")).distinct
    assert(cc.toSeq == Seq(1000L), s"expected one cluster rooted at 1000, got $cc")
  }

  test("connectedComponents: per-partition union-find pre-contracts local structure") {
    // A chain living in ONE partition must be fully solved by the local
    // union-find: the global loop sees already-correct labels and needs
    // only the single no-change round maxIter = 1 allows.
    val local = (1L until 257L).map(i => (i, i + 1)).toDF("da", "db")
      .coalesce(1)
    val cc1 = Dedup.connectedComponents(local, maxIter = 1).collect()
      .map(r => r.getAs[Long]("cluster_id")).distinct
    assert(cc1.toSeq == Seq(1L), s"single-partition chain: got $cc1")
    // Range-partitioned into 8 contiguous segments, contraction leaves an
    // 8-star meta-chain; pointer jumping needs ceil(log2(8)) = 3 doubling
    // rounds plus the no-change round.
    val seg = (1L until 257L).map(i => (i, i + 1)).toDF("da", "db")
      .repartitionByRange(8, col("da"))
    val cc8 = Dedup.connectedComponents(seg, maxIter = 4).collect()
      .map(r => r.getAs[Long]("cluster_id")).distinct
    assert(cc8.toSeq == Seq(1L), s"segmented chain: got $cc8")
  }

  test("incremental dedup admits only unseen-digest, first-in-delta rows") {
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "beta"), // already in the corpus → dropped
      (11L, "gamma"), (12L, "gamma"), // intra-delta dup → first id wins
      (13L, "delta")).toDF("doc_id", "text")
    val admitted = Dedup.incremental(corpus, delta).collect()
      .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    assert(admitted == Seq(11L, 13L), s"admitted $admitted")
    // idempotence: re-running the SAME delta against corpus+admitted
    // admits nothing (the steady-state daily-increment invariant)
    val grown = corpus.unionByName(
      delta.filter(col("doc_id").isin(11L, 13L)))
    assert(Dedup.incremental(grown, delta).isEmpty)
  }

  test("bucketed seen-index: incremental dedup joins with zero corpus-side shuffle") {
    val corpus = Seq(
      (1L, "alpha doc"), (2L, "beta doc"), (3L, "gamma doc"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (11L, "alpha doc"), // already seen → rejected
      (12L, "delta doc"), // fresh → admitted
      (13L, "delta doc"), // intra-delta dup → first wins
      (14L, "epsilon doc"))
      .toDF("doc_id", "text")
    val wh = java.nio.file.Files.createTempDirectory("graft_seenidx_").toString
    Dedup.writeSeenIndex(corpus, "seen_idx", s"$wh/seen_idx", buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // disable broadcast + AQE so the plan shows the real shuffle layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val admitted = Dedup.incrementalIndexed(spark, "seen_idx", delta)
      // same answer as the from-scratch incremental
      val want = Dedup.incremental(corpus, delta).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      val got = admitted.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(got == want && got == Seq(12L, 14L), s"admitted $got")
      // THE point of the index: exactly one Exchange in the whole plan
      // (the delta's digest shuffle, reused by its groupBy) — the seen
      // side reads pre-bucketed, no corpus-side movement
      val plan = admitted.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected 1 exchange (delta side only):\n$plan")
      // the digest column must survive the bucketed saveAsTable round-trip
      // as 16 RAW BYTES — half the shuffle/index volume of the hex string
      assert(spark.table("seen_idx").schema("h").dataType ==
        org.apache.spark.sql.types.BinaryType)
      // closing the loop: append admitted digests (full index row — md5
      // key + the streaming posture's xxhash pair), re-run → nothing
      // admitted
      admitted.select(col("h"), col("h1"), col("h2"))
        .write.bucketBy(4, "h").sortBy("h")
        .option("path", s"$wh/seen_idx").mode("append").saveAsTable("seen_idx")
      assert(Dedup.incrementalIndexed(spark, "seen_idx", delta).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS seen_idx")
    }
  }

  test("persisted band index: near-dup increment rejects fuzzy recrawls, " +
      "delta-only exchanges, idempotent append-back") {
    val standing = docsDF(Seq(
      1L -> base,
      2L -> "completely different content about spark shuffles and partitions and codegen",
      3L -> "yet another unrelated document mentioning catalyst optimizer rules and pushdown"))
    val delta = docsDF(Seq(
      11L -> base,                              // exact recrawl → est j = 1 → rejected
      12L -> base.replace("lazy", "sleepy"),    // paraphrased recrawl → rejected
      13L -> "fresh story about bucketed joins and sort merge exchanges in the planner",
      14L -> "orthogonal text on watermark semantics and stateful stream sessionization",
      // INTRA-delta near-dup of 13: new relative to the index, but the
      // smaller-id survivor wins — only 13 may be admitted
      15L -> "fresh story about bucketed joins and sort merge exchanges in the planner today"))
    val wh = java.nio.file.Files.createTempDirectory("graft_bandidx_").toString
    Dedup.writeBandIndex(standing, "band_idx", s"$wh/band_idx", buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val admitted = Dedup.minhashIncremental(spark, "band_idx", delta)
      val got = admitted.select("doc_id").distinct().collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(13L, 14L), s"admitted $got")
      // the whole point: every exchange is DELTA-sized — the index side of
      // the candidate join reads pre-bucketed on (band, bh), no exchange
      // above its scan, and the delta's signature aggregate is computed
      // once (ReusedExchange on the admission side)
      val plan = admitted.queryExecution.executedPlan.toString
      val idxSide = plan.split("\n").filter(_.contains("band_idx"))
      assert(idxSide.nonEmpty, plan)
      // a ReusedExchange node's suffix echoes its target's description, so
      // count real Exchange LINES only. Five delta-sized exchanges: the
      // signature aggregate (computed once — reused by the probe, the
      // intra-delta self-join and the admission side), band keys into the
      // index join, flagged-id distinct, band keys into the intra-delta
      // self-join (one exchange, reused for both sides), intra-rejected
      // distinct.
      val exchanges = plan.split("\n").count(l =>
        l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
      assert(exchanges == 5, s"expected 5 delta-sided exchanges:\n$plan")
      assert(plan.contains("ReusedExchange"),
        s"delta signature subtree should be computed once:\n$plan")
      // no exchange keyed on the index's own output: the only (band, bh)
      // partitionings are the delta sides of the index join and self-join
      assert(plan.split("\n").count(l =>
        l.contains("Exchange hashpartitioning(band") &&
          !l.contains("ReusedExchange")) == 2, plan)
      // close the loop: append admitted band rows, re-run → nothing admitted
      // (a re-arriving admitted doc is now a j=1 near-dup of its own entry)
      admitted.select(col("doc_id"), col("band"), col("bh"), col("sig"))
        .write.bucketBy(4, "band", "bh").sortBy("band", "bh")
        .option("path", s"$wh/band_idx").mode("append").saveAsTable("band_idx")
      assert(Dedup.minhashIncremental(spark, "band_idx", delta).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS band_idx")
    }
  }

  test("persisted simhash index: increment rejects recrawls by EXACT " +
      "hamming, intra-delta min-id-wins, idempotent append-back") {
    val standing = docsDF(Seq(
      1L -> base,
      2L -> "completely different content about spark shuffles and partitions and codegen",
      3L -> "yet another unrelated document mentioning catalyst optimizer rules and pushdown"))
    val delta = docsDF(Seq(
      11L -> base,                              // exact recrawl → hamming 0 → rejected
      // APPENDED token (not a swap): on a short doc a swapped token flips
      // many signature bits, an appended one barely moves the majority
      // votes — this is the near-identical-multiset case simhash catches
      12L -> (base + " indeed"),
      13L -> "fresh story about bucketed joins and sort merge exchanges in the planner",
      14L -> "orthogonal text on watermark semantics and stateful stream sessionization",
      // INTRA-delta near-dup of 13: only the smaller id may be admitted
      15L -> "fresh story about bucketed joins and sort merge exchanges in the planner today"))
    val wh = java.nio.file.Files.createTempDirectory("graft_shidx_").toString
    Dedup.writeSimhashIndex(standing, "sh_idx", s"$wh/sh_idx", buckets = 4)
    try {
      val admitted = Dedup.simhashIncremental(spark, "sh_idx", delta)
      val got = admitted.select("doc_id").distinct().collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(13L, 14L), s"admitted $got")
      // append-back loop: a re-arriving admitted doc collides with its own
      // entry at hamming 0 → the retried delta admits nothing
      admitted.select(col("doc_id"), col("sh"), col("tbl"), col("key"))
        .write.bucketBy(4, "tbl", "key").sortBy("tbl", "key")
        .option("path", s"$wh/sh_idx").mode("append").saveAsTable("sh_idx")
      assert(Dedup.simhashIncremental(spark, "sh_idx", delta).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS sh_idx")
    }
  }

  test("LSH-pair clustering recovers >= 0.8 of exact-closure co-cluster pairs at test SF") {
    val d = graft.Tables.load(spark, sf, "documents")
    def coPairs(cc: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      cc.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
        .groupBy(_._2).values.flatMap { members =>
          val ids = members.map(_._1).sorted
          for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
        }.toSet
    val truth = coPairs(Dedup.connectedComponents(Dedup.ngramJaccard(d, 0.6)))
    val lsh = coPairs(Dedup.connectedComponents(Dedup.minhashLsh(d, threshold = 0.6)))
    assert(truth.nonEmpty, "fixture has no exact near-dup clusters")
    val recall = truth.intersect(lsh).size.toDouble / truth.size
    assert(recall >= 0.8, s"cluster-pair recall $recall over ${truth.size} true pairs")
  }

  test("semDedup groups planted near-dups, keeps exactly one survivor per group") {
    val dim = 16
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 31 + j * 17) % 97) - 48).toFloat / 48f)
    def jitter(v: Array[Float], eps: Float): Array[Float] =
      v.zipWithIndex.map { case (x, j) => x + (if (j == 0) eps else 0f) }
    // two planted dup groups ({1,2,3} around vec(1), {10,11} around vec(7))
    // plus three singletons
    val emb = Seq(
      (1L, vec(1)), (2L, jitter(vec(1), 0.01f)), (3L, jitter(vec(1), -0.01f)),
      (10L, vec(7)), (11L, jitter(vec(7), 0.02f)),
      (20L, vec(13)), (21L, vec(29)), (22L, vec(43)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(emb, tau = 0.99, nCentroids = 4, dim = dim).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("survivor_id"),
        r.getAs[Boolean]("keep")))
    assert(out.length == 8, s"every corpus vector must appear: ${out.toSeq}")
    val bySurvivor = out.groupBy(_._2)
    // min-id survivor per planted group, singletons survive as themselves
    assert(bySurvivor(1L).map(_._1).toSet == Set(1L, 2L, 3L), s"${out.toSeq}")
    assert(bySurvivor(10L).map(_._1).toSet == Set(10L, 11L), s"${out.toSeq}")
    Seq(20L, 21L, 22L).foreach(id =>
      assert(bySurvivor(id).map(_._1).toSet == Set(id), s"${out.toSeq}"))
    // exactly one keep per group, and it is the survivor itself
    bySurvivor.foreach { case (s, members) =>
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == s,
        s"group $s keep rule broken: ${members.toSeq}")
    }
  }

  test("semDedup recall >= 0.8 vs exact pairwise cosine on a planted corpus") {
    val dim = 16
    // independent random directions (seeded → deterministic): 60 base
    // vectors at pairwise |cos| ~ 1/√dim, far from tau — the modular
    // family the other specs use produces near-shifted copies that
    // legitimately merge ACROSS bases at 0.99 and would fog ground truth
    def vec(seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
    }
    // 60 base vectors; every 6th gets a planted near-dup twin (10 pairs)
    val base = (0 until 60).map(i => (i.toLong, vec(i + 3)))
    val twins = (0 until 60 by 6).map(i =>
      (100L + i, vec(i + 3).zipWithIndex.map { case (x, j) =>
        x + (if (j == 1) 0.015f else 0f) }))
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(emb, tau = 0.99, nCentroids = 8, dim = dim).collect()
    // ground truth: twin i belongs with base i — count how many planted
    // twins were grouped with their base (cluster splits can miss some;
    // the paper's recall lever is nCentroids vs corpus density)
    val twinRows = out.filter(_.getAs[Long]("vec_id") >= 100L)
    val found = twinRows.count(r =>
      r.getAs[Long]("survivor_id") == r.getAs[Long]("vec_id") - 100L)
    assert(twinRows.length == 10)
    assert(found >= 8, s"semantic recall $found/10 below 0.8")
    // soundness: a base vector never groups under a DIFFERENT base (no
    // false merges at tau=0.99 — non-dup cosines in this corpus are far
    // lower)
    val falseMerges = out.filter(r => r.getAs[Long]("vec_id") < 100L &&
      r.getAs[Long]("survivor_id") != r.getAs[Long]("vec_id"))
    assert(falseMerges.isEmpty, s"false merges: ${falseMerges.toSeq}")
  }

  test("semDedup emits zero-norm vectors as their own survivors, never paired") {
    val dim = 16
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 31 + j * 17) % 97) - 48).toFloat / 48f)
    val emb = Seq(
      (1L, vec(1)), (2L, vec(1).zipWithIndex.map { case (x, j) =>
        x + (if (j == 0) 0.01f else 0f) }),
      (50L, Array.fill(dim)(0f)), (51L, Array.fill(dim)(0f)),
      (60L, vec(9)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(emb, tau = 0.99, nCentroids = 2, dim = dim).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("survivor_id"),
        r.getAs[Boolean]("keep")))
    assert(out.length == 5, s"every vector must appear: ${out.toSeq}")
    // zero vectors have undefined cosine: each survives as its own group
    // (NOT pooled into one pseudo-cluster or merged with each other)
    Seq(50L, 51L).foreach { id =>
      val row = out.find(_._1 == id).get
      assert(row._2 == id && row._3, s"zero vector $id mishandled: $row")
    }
    // the planted near-dup pair still groups
    assert(out.find(_._1 == 2L).get._2 == 1L)
  }

  test("semDedup holds its invariants at nCentroids=256 on the sf0.1 embeddings") {
    // paper-posture resolution (nCentroids ∝ n) on real data: the r6
    // driver-side trainer could not run past 4096 samples single-threaded;
    // this pins the distributed path through the full operator
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n = emb.count()
    val out = Dedup.semDedup(emb, tau = 0.95, nCentroids = 256, dim = 64).cache()
    try {
      assert(out.count() == n, "every corpus vector appears exactly once")
      // survivor is the min vec_id of its group, keep marks survivors only
      assert(out.filter(col("survivor_id") > col("vec_id")).isEmpty)
      assert(out.filter(col("keep") =!= (col("vec_id") === col("survivor_id"))).isEmpty)
      // every named survivor is itself a kept row (groups are well-formed)
      val orphans = out.select(col("survivor_id").as("vec_id")).distinct()
        .join(out.filter(col("keep")), Seq("vec_id"), "left_anti")
      assert(orphans.isEmpty, "survivor_id pointing at a non-kept row")
    } finally { out.unpersist(); () }
  }

  test("substrDup: window accounting, shared-prefix detection, short-doc zeroes") {
    // 100-char docs, w=40/stride=10 → 7 windows each ((100-40)/10 + 1).
    // All blocks are APERIODIC so only the planted duplications witness
    // (a uniform or periodic block would silently self-duplicate windows).
    val prefix = (('a' to 'z') ++ ('A' to 'X')).mkString // 50 chars, shared
    val tail1 = "0123456789" + ('A' to 'Z').mkString + "!@#$%^&*()[]{}".take(14)
    val tail2 = "zyxwvutsrqponmlkjihgfedcba" + "9876543210" + "%^&*()[]{}" + "<>?~"
    val d1 = prefix + tail1                   // shares only the prefix with d2
    val d2 = prefix + tail2
    val d3 = ("z123456789" * 10)              // 10-char motif: every window = motif*4
    val short = "tiny"                        // < w → zero windows
    val docs = docsDF(Seq(1L -> d1, 2L -> d2, 3L -> d3, 4L -> short))
    val out = Dedup.substrDup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    // d1/d2 duplicate exactly the windows fully inside the shared 50-char
    // prefix: offsets 0 and 10 ([0,40), [10,50)) — 2 of 7; frac 2/7 >= 0.2.
    assert(out(1L) == ((7L, 2L, 2.0 / 7.0, true)))
    assert(out(2L) == ((7L, 2L, 2.0 / 7.0, true)))
    // d3's motif periodicity makes ALL its windows the identical motif*4
    // string — within-doc repetition counts, as in ExactSubstr.
    assert(out(3L) == ((7L, 7L, 1.0, true)))
    assert(out(4L) == ((0L, 0L, 0.0, false)))
  }

  test("substrDup: both count forms agree; no cartesian anywhere") {
    val byJoin = Dedup.substrDup(corpus).collect().map(_.toSeq).toSet
    val byWindow = Dedup.substrDup(corpus, useWindow = true).collect().map(_.toSeq).toSet
    assert(byJoin == byWindow)
    for (useWindow <- Seq(true, false)) {
      val plan = Dedup.substrDup(corpus, useWindow = useWindow)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"))
    }
    // the default (join) form: count join + final doc_id left join only
    val joins = Dedup.substrDup(corpus).queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 2, s"expected count join + doc_id left join, got ${joins.size}")
  }

  test("incremental clustering: a bridging delta merges two standing " +
      "clusters to the exact full-recompute labels") {
    val sA = "alpha beta gamma delta epsilon zeta eta theta"
    val sB = "one two three four five six seven eight"
    val standing = docsDF(Seq(
      1L -> sA, 2L -> sA.replace("zeta", "zzz"),
      3L -> sB, 4L -> sB.replace("six", "sixx")))
    // doc 5 bridges clusters {1,2} and {3,4}; doc 6 is a delta-delta
    // near-dup of 5 (exercises the both-delta orientation filter)
    val bridge = "alpha beta gamma delta epsilon zeta one two three four five six"
    val delta = docsDF(Seq(5L -> bridge, 6L -> bridge.replace("four", "fourx")))
    val all = standing.unionByName(delta)
    val oldMap = Dedup.connectedComponents(Dedup.ngramJaccard(standing, 0.3))
    val inc = Dedup.incrementalCluster(oldMap,
        Dedup.ngramJaccardDelta(all, delta.select("doc_id"), 0.3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(Dedup.ngramJaccard(all, 0.3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full, s"incremental $inc != full recompute $full")
    // the bridge really merged: everything labels to the global min
    assert(inc.values.toSet == Set(1L) && inc.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("randomized: incremental substring dedup == full recompute on the " +
      "delta docs (3 seeded corpora)") {
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again with plenty of padding text to clear the window width"
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(100 + seed)
      // shared substrings across docs so window counts genuinely cross 2
      val corpus9 = (1L to 9L).map { id =>
        val extra = Seq.fill(2 + rnd.nextInt(3))(
          base.substring(rnd.nextInt(20), 60 + rnd.nextInt(50))).mkString(" ")
        id -> (base + " " + extra)
      }
      val all = docsDF(corpus9)
      val delta = all.filter(col("doc_id") % 3 === 0)
      val standing = all.filter(col("doc_id") % 3 =!= 0)
      val tbl = s"test_substr_idx_$seed"
      val path = java.nio.file.Files
        .createTempDirectory("graft_substr_spec_").resolve("t").toString
      Dedup.writeSubstrIndex(standing, tbl, path)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup"),
            r.getAs[Boolean]("flagged")))).toMap
      val inc = rows(Dedup.substrIncremental(spark, tbl, delta))
      val full = rows(Dedup.substrDup(all))
        .filter { case (id, _) => id % 3 == 0 }
      assert(inc == full, s"seed $seed: incremental $inc != full $full")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("randomized: delta-sided pairs == full pairs touching delta, and " +
      "incremental clustering == full recompute (5 seeded corpora)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
        "eta", "theta", "iota", "kappa")
      // 12 docs of 6-10 tokens from a 10-token vocab: dense enough that
      // shingles collide and clusters form, random enough to explore
      // orientations (delta-delta, delta-standing, standing-standing)
      val docs12 = (1L to 12L).map { id =>
        id -> Seq.fill(6 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val all = docsDF(docs12)
      val deltaIds = docs12.map(_._1).filter(_ % 3 == 0)
      val delta = all.filter(col("doc_id").isin(deltaIds: _*))
      val standing = all.filter(!col("doc_id").isin(deltaIds: _*))
      val t = 0.3
      def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
      val fullPairs = Dedup.ngramJaccard(all, t)
      val expected = pairSet(fullPairs.filter(
        col("da").isin(deltaIds: _*) || col("db").isin(deltaIds: _*)))
      val got = pairSet(Dedup.ngramJaccardDelta(all, delta.select("doc_id"), t))
      assert(got == expected, s"seed $seed: delta pairs $got != $expected")
      val inc = Dedup.incrementalCluster(
          Dedup.connectedComponents(Dedup.ngramJaccard(standing, t)),
          Dedup.ngramJaccardDelta(all, delta.select("doc_id"), t))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = Dedup.connectedComponents(fullPairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc == full, s"seed $seed: incremental $inc != full $full")
    }
  }

  test("forgetDigests: shared content survives the purge, unshared digests " +
    "leave, and the result equals a rebuild from survivors") {
    import spark.implicits._
    // docs 1,2 share content; 3 is unique-and-forgotten; 4 unique-kept
    val corpus = Seq(
      (1L, "shared text"), (2L, "shared text"),
      (3L, "forget me"), (4L, "keep me")).toDF("doc_id", "text")
    val tbl = "forget_spec_idx"
    val path = java.nio.file.Files
      .createTempDirectory("forget_spec_").resolve("t").toString
    Dedup.writeSeenIndex(corpus, tbl, path)
    assert(spark.table(tbl).count() == 3) // 3 distinct contents
    // forget docs 2 and 3: "shared text" survives via doc 1; "forget me"
    // has no surviving contributor and must leave the index
    val forgotten = corpus.filter($"doc_id".isin(2L, 3L))
    val survivors = corpus.filter(!$"doc_id".isin(2L, 3L))
    val updated = Dedup.forgetDigests(spark, tbl, forgotten, survivors)
    val rebuilt = survivors.select(unhex(md5($"text")).as("h")).distinct()
    assert(updated.count() == 2)
    assert(updated.select("h").exceptAll(rebuilt).isEmpty)
    assert(rebuilt.exceptAll(updated.select("h")).isEmpty)
  }
}
