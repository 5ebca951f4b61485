package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.3 #41-42).
  *
  * Scale shape: the corpus is NEVER shuffled whole. Brute force scores
  * per-partition and pre-selects k rows per (query, partition) before the
  * only shuffle (q × partitions × k scored 3-column rows); the LSH variant
  * buckets the corpus once and probes only matching buckets.
  */
object Similarity {

  /** Partial top-k selection over a scored (query_id, vec_id, cos) set:
    * each input partition reduces to <= k rows per query map-side (the
    * [[graft.functions.TopKSelect]] native aggregate — a plain JVM buffer
    * object, two primitive reads + a bounded insert per scored row, no
    * row↔object encoding), so the ONLY shuffle moves q × partitions × k
    * entries as serialized buffers — never the scored set itself. A
    * `row_number().over(Window.partitionBy(query_id))` would exchange
    * every scored row first; this is the difference between a bounded
    * selection and shuffling the whole candidate scan at 100 TB.
    * Ordering and rank tie-break: (cos desc, vec_id asc), identical to
    * the window form. `dedup` collapses repeated (query, vec) arrivals
    * with identical scores (LSH multi-table/probe collisions) without a
    * separate `distinct()` shuffle. */
  private def selectTopK(scored: DataFrame, k: Int, dedup: Boolean = false): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.GraftFunctions.topk_select(
        struct(col("vec_id"), col("cos")), k, dedup).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("__r", "__s")))
      .select(col("query_id"), col("__s.vec_id").as("vec_id"),
        col("__s.cos").as("cos"), (col("__r") + 1).as("rank"))

  /** Exact cosine top-k for each query vector. Scoring is a map-only pass
    * (queries broadcast); selection is the typed partial top-k aggregator
    * above, so the only shuffle carries k-bounded buffers per (query,
    * partition) — the corpus itself never moves. */
  def topKBruteForce(emb: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val corpus = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    selectTopK(scored, k)
  }

  /** Hard-negative mining — the retrieval/contrastive-training staple:
    * for each query, the nearest candidates that are (a) not the query
    * itself, (b) from a DIFFERENT source (same-source pairs are the
    * positives a contrastive objective contrasts against), and (c) not an
    * exact content duplicate (a near-dup scored as a "negative" poisons
    * the loss). Returns (query_id, vec_id, rank) — rank-only like
    * [[topKBruteForce]], since cross-engine cosine is rank-stable but not
    * ulp-identical.
    *
    * Scale shape: candidate metadata joins on the id (hash join,
    * co-partitionable with the embedding table), queries broadcast, the
    * exclusion predicates ride the broadcast join condition (map-only),
    * and the shortlist reduces through the k-bounded partial top-k
    * ([[selectTopK]]) — no corpus sort, no window over raw rows. */
  def hardNegatives(emb: DataFrame, docs: DataFrame, queries: DataFrame,
      k: Int = 5): DataFrame = {
    val meta = docs.select(col("doc_id"), col("source"),
      md5(col("text")).as("__hn_h"))
    val corpus = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .join(meta, col("vec_id") === col("doc_id")).drop("doc_id")
    val q = queries.select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      .join(meta.select(col("doc_id"), col("source").as("__hn_qsrc"),
        col("__hn_h").as("__hn_qh")), col("query_id") === col("doc_id"))
      .drop("doc_id")
    val scored = corpus.join(broadcast(q),
        col("vec_id") =!= col("query_id") &&
          col("source") =!= col("__hn_qsrc") &&
          col("__hn_h") =!= col("__hn_qh"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    selectTopK(scored, k)
  }

  /** INDEX-BACKED hard-negative mining — [[hardNegatives]] riding the
    * persisted IVF index ([[writeIvfIndex]]), so the anchor set can be
    * the WHOLE corpus. The brute-force form broadcasts the anchors and
    * nested-loop-scans the corpus — O(n²) with an O(n) broadcast exactly
    * in the operator's real use case (mining negatives for EVERY anchor
    * of a contrastive training set, where anchors ≈ corpus; r13 VERDICT
    * "What's wrong" #1). Here nothing is ever collected or broadcast at
    * corpus scale:
    *
    *  - probe ASSIGNMENT is a distributed expression: each anchor row
    *    scores the sidecar centroids (a bounded nCentroids×d literal) and
    *    keeps its `nProbe` best list ids — same (cos desc, index asc)
    *    ordering and zero-norm→0.0 convention as the driver-side
    *    `bestDot` path, so with equal settings a bounded anchor set
    *    probes the same lists [[topKIvfIndexed]] would;
    *  - candidates come from a hash EQUI-join of (anchor, cid) probes
    *    against the cid-bucketed index — never a nested loop (the probe
    *    fan-out is nProbe rows per anchor, and join parallelism is
    *    list-granular: nCentroids is the knob a production corpus sizes
    *    like √n, the standard IVF regime);
    *  - the three exclusion predicates (not-self, different source, not
    *    an exact content duplicate) filter map-side above the join, with
    *    the doc metadata attached by id equi-joins on both sides;
    *  - the shortlist reduces through the k-bounded partial top-k
    *    ([[selectTopK]]) — no corpus sort, no window over raw rows.
    *
    * With `nProbe >= nCentroids` every list is probed and the result is
    * row-identical to [[hardNegatives]] on a zero-norm-free corpus
    * (spec-pinned); at production settings it is approximate with the
    * recall measured by the `pipeline_hard_negatives_ivf_check` face. */
  def hardNegativesIvf(spark: SparkSession, table: String, docs: DataFrame,
      queries: DataFrame, k: Int = 5, nProbe: Int = 8,
      salts: Int = 16): DataFrame = {
    val (centroids, _) = readIndexMeta(spark, table)
    val nC = centroids.length
    val p = math.min(nProbe, nC)
    val cLit = typedLit(centroids.map(_.toSeq).toSeq)
    val meta = docs.select(col("doc_id"), col("source"),
      md5(col("text")).as("__hn_h"))
    val anchors = queries.select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      .join(meta.select(col("doc_id"), col("source").as("__hn_qsrc"),
        col("__hn_h").as("__hn_qh")), col("query_id") === col("doc_id"))
      .drop("doc_id")
      // nanvl: a zero-norm anchor scores NaN against every centroid;
      // bestDot's convention is 0.0 there, which makes probe order fall
      // back to centroid index on both paths
      .withColumn("__scores",
        transform(cLit, c => nanvl(Dedup.cosine(col("qv"), c), lit(0.0))))
      .withColumn("cid", explode(expr(
        s"""transform(slice(array_sort(
              zip_with(__scores, sequence(0, ${nC - 1}),
                       (s, i) -> struct(s AS s, i AS i)),
              (a, b) -> CASE WHEN a.s > b.s THEN -1 WHEN a.s < b.s THEN 1
                             WHEN a.i < b.i THEN -1 ELSE 1 END),
            1, $p), x -> x.i)""")))
      .drop("__scores")
      // SALT the probe join: cid alone has only nCentroids distinct
      // values, so an unsalted equi-join runs at list granularity — at
      // most nCentroids tasks busy however many cores exist (measured:
      // the sf1 all-anchor face spent its 50 s in ~8 effective tasks).
      // Anchors take a deterministic salt from their id; the index side
      // replicates across the salt domain (the SkewJoin posture — the
      // replicated side is the INDEX, vectors-only, a fraction of the
      // corpus text), so every (anchor, candidate) pair still meets
      // exactly once and parallelism becomes nCentroids × salts.
      .withColumn("__salt",
        pmod(xxhash64(col("query_id")), lit(salts.toLong)).cast("int"))
    val idx = spark.table(table).select(col("vec_id"), col("cid"), col("v"))
      .join(meta, col("vec_id") === col("doc_id")).drop("doc_id")
      .withColumn("__salt",
        explode(sequence(lit(0), lit(salts - 1))))
    val scored = idx.join(anchors, Seq("cid", "__salt"))
      .filter(col("vec_id") =!= col("query_id") &&
        col("source") =!= col("__hn_qsrc") &&
        col("__hn_h") =!= col("__hn_qh"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    selectTopK(scored, k)
  }

  /** Exact population covariance matrix of the embedding dimensions — the
    * statistic under whitening/PCA decisions and embedding-drift QA.
    * Distributed linear-algebra shape: each row expands to its
    * upper-triangle outer products INSIDE the row (an array column), and
    * [[graft.functions.VecSumAgg]] folds partitions element-wise so only
    * d(d+1)/2-wide partial buffers cross the exchange — never n·d² rows
    * (the posexplode+groupBy spelling) and never a driver-side fold.
    * cov(i,j) = Σxᵢxⱼ/n − (Σxᵢ/n)(Σxⱼ/n), rounded 6 dp (distributed double
    * partial-sum order is ulp-nondeterministic). */
  def covariance(emb: DataFrame, dim: Int): DataFrame = {
    val withV = emb.select(
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val tri = expr(s"flatten(transform(sequence(0, ${dim - 1}), i -> " +
      s"transform(sequence(i, ${dim - 1}), j -> " +
      "element_at(v, i + 1) * element_at(v, j + 1))))")
    val agg = withV.select(col("v"), tri.as("xx"))
      .agg(count(lit(1)).cast("double").as("n"),
        graft.functions.GraftFunctions.vec_sum(col("v")).as("s"),
        graft.functions.GraftFunctions.vec_sum(col("xx")).as("ss"))
    val ij = expr(s"flatten(transform(sequence(0, ${dim - 1}), i -> " +
      s"transform(sequence(i, ${dim - 1}), j -> struct(i, j))))")
    val pos = expr(
      s"CAST(ij.i * $dim - ij.i * (ij.i - 1) DIV 2 + (ij.j - ij.i) + 1 AS INT)")
    agg.select(col("n"), col("s"), col("ss"), explode(ij).as("ij"))
      .select(
        col("ij.i").cast("long").as("i"),
        col("ij.j").cast("long").as("j"),
        // + 0.0 canonicalizes IEEE -0.0 to +0.0 (the two stringify
        // differently in the bit-exact compare; both engines produce a
        // mix at rounded-away-to-zero cells)
        (round(element_at(col("ss"), pos) / col("n")
          - (element_at(col("s"), expr("CAST(ij.i + 1 AS INT)")) / col("n"))
          * (element_at(col("s"), expr("CAST(ij.j + 1 AS INT)")) / col("n")),
          6) + lit(0.0)).as("cov"))
  }

  /** Top principal component by power iteration on the [[covariance]]
    * matrix — the embedding-drift / whitening diagnostic. The distributed
    * part is the covariance reduction (VecSumAgg partial buffers); the
    * eigensolve then runs on a FIXED d×d matrix whose size is
    * data-independent, the same shape as Spark MLlib's RowMatrix
    * (computePrincipalComponents collects the Gram matrix too) — at any
    * corpus size the driver holds d², never rows. Determinism: start at
    * the basis vector of the largest diagonal, max-abs renormalization
    * per step (no sqrt until the end), sign fixed so the largest-|x|
    * loading is positive (ties → lowest index). Output is engine-specific
    * float iteration → rows-only face; `emb_pca_check` certifies unit
    * norm, the eigen residual ‖Cv−λv‖∞ ≤ 1e-5·λ (4096 max-abs-renormalized steps: the synthetic corpus is near-isotropic, λ₂/λ₁ ≈ 0.987, so convergence is (λ₂/λ₁)^k — 64 steps left a 1.6e-4 residual), the sign convention and
    * the explained-share range. */
  def pcaTop(emb: DataFrame, dim: Int, iters: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    val (vn, lambda, trace) = pcaSolve(emb, dim, iters)
    import spark.implicits._
    vn.zipWithIndex.map { case (l, i) =>
      (i.toLong, math.rint(l * 1e6) / 1e6,
        math.rint(lambda * 1e6) / 1e6,
        math.rint(lambda / trace * 1e6) / 1e6)
    }.toSeq.toDF("i", "loading", "eigenvalue", "explained_share")
  }

  /** The engine-side certification twin of [[pcaTop]] (#124 pattern). */
  def pcaTopCheck(emb: DataFrame, dim: Int, iters: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    val (vn, lambda, _) = pcaSolve(emb, dim, iters)
    val c = covMatrix(emb, dim)
    val cv = Array.tabulate(dim) { i =>
      var s = 0.0; var j = 0
      while (j < dim) { s += c(i)(j) * vn(j); j += 1 }; s
    }
    val resid = cv.zip(vn).map { case (a, b) => math.abs(a - lambda * b) }.max
    val norm = vn.map(x => x * x).sum
    val am = vn.indices.maxBy(i => (math.abs(vn(i)), -i))
    import spark.implicits._
    Seq((
      math.abs(norm - 1.0) < 1e-9,
      resid <= 1e-5 * math.max(lambda, 1e-12),
      vn(am) >= 0.0,
      lambda > 0.0)).toDF("unit_norm_ok", "residual_ok", "sign_ok", "share_ok")
  }

  private def covMatrix(emb: DataFrame, dim: Int): Array[Array[Double]] = {
    val cells = covariance(emb, dim).collect() // d(d+1)/2 rows, fixed size
    val c = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      val v = r.getDouble(2)
      c(i)(j) = v; c(j)(i) = v
    }
    c
  }

  private def pcaSolve(emb: DataFrame, dim: Int,
      iters: Int): (Array[Double], Double, Double) = {
    val c = covMatrix(emb, dim)
    var best = 0
    var i = 1
    while (i < dim) { if (c(i)(i) > c(best)(best)) best = i; i += 1 }
    var v = Array.tabulate(dim)(k => if (k == best) 1.0 else 0.0)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { r =>
        var s = 0.0; var j = 0
        while (j < dim) { s += c(r)(j) * v(j); j += 1 }; s
      }
      val m = w.map(math.abs).max
      v = if (m == 0) w else w.map(_ / m)
      it += 1
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    val vn = if (n == 0) v else v.map(_ / n)
    val cv = Array.tabulate(dim) { r =>
      var s = 0.0; var j = 0
      while (j < dim) { s += c(r)(j) * vn(j); j += 1 }; s
    }
    val lambda = vn.zip(cv).map { case (a, b) => a * b }.sum
    val trace = (0 until dim).map(k => c(k)(k)).sum
    val am = vn.indices.maxBy(k => (math.abs(vn(k)), -k))
    val sgn = if (vn(am) < 0) -1.0 else 1.0
    (vn.map(_ * sgn), lambda, trace)
  }

  /** MMR (maximal marginal relevance) re-ranking — the diversification
    * pass between retrieval and a context window: greedily pick the
    * candidate maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    * picked, so near-duplicate hits don't crowd out coverage. Exact greedy
    * over a BOUNDED per-query shortlist (top-m by cosine): the shortlist
    * caps the quadratic term at m² per query, and each of the k−1 greedy
    * steps is a tiny join+window over (queries × m) rows — never the
    * corpus. Iterative steps localCheckpoint so the plan stays linear in
    * k. Ties break by vec_id; the oracle replays the same greedy chain in
    * generated chained-CTE SQL (see PipelineQueries.mmrOracleSql) with
    * constants emitted from the SAME doubles, so selection is
    * deterministic cross-engine (rank-only output, the bruteforce
    * discipline). */
  /** Exact-count gate for the MMR driver finish (the Graph/CC posture):
    * when the checkpointed shortlist and pairwise-sim frames both fit,
    * the k−1 greedy steps run in one driver loop instead of k−1 scheduled
    * join+window+checkpoint rounds (~45 tiny jobs at k=5). 0 disables. */
  val MmrSmallKey = "spark.graft.mmr.smallCandidates"

  def mmrRerank(emb: DataFrame, queries: DataFrame, k: Int = 5, m: Int = 20,
      lam: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shortlist = topKBruteForce(emb, queries, m)
      .select(col("query_id"), col("vec_id"), col("cos"))
    val vecs = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val cand = shortlist.join(vecs, "vec_id").localCheckpoint(true)
    val pa = cand.select(col("query_id"), col("vec_id").as("a"), col("v").as("va"))
    val pb = cand.select(col("query_id"), col("vec_id").as("b"), col("v").as("vb"))
    val pairs = pa.join(pb, Seq("query_id")).filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        Dedup.cosine(col("va"), col("vb")).as("sim"))
      .localCheckpoint(true)
    val base = cand.select(col("query_id"), col("vec_id"), col("cos"))
    val driver = mmrDriver(base, pairs, k, lam)
    if (driver.isDefined) return driver.get
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    var selected = base.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("vec_id"), lit(1L).as("mmr_rank"))
    var t = 2
    while (t <= k) {
      val rem = base.join(selected, Seq("query_id", "vec_id"), "left_anti")
      val ms = pairs
        .join(selected.select(col("query_id"), col("vec_id").as("b")),
          Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a")).agg(max(col("sim")).as("maxsim"))
        .withColumnRenamed("a", "vec_id")
      val wt = Window.partitionBy(col("query_id"))
        .orderBy(col("obj").desc, col("vec_id"))
      val next = rem.join(ms, Seq("query_id", "vec_id"))
        .select(col("query_id"), col("vec_id"),
          (lit(lam) * col("cos") - lit(1 - lam) * col("maxsim")).as("obj"))
        .withColumn("__rn", row_number().over(wt))
        .filter(col("__rn") === 1)
        .select(col("query_id"), col("vec_id"), lit(t.toLong).as("mmr_rank"))
      selected = selected.unionByName(next).localCheckpoint(true)
      t += 1
    }
    selected
  }

  /** Driver finish for [[mmrRerank]]: replays the identical greedy
    * selection over the collected (query_id, vec_id, cos) shortlist and
    * (query_id, a, b, sim) pair table. Exactness contract, matched
    * op-for-op with the distributed spelling:
    *  - step 1 picks max by (cos DESC, vec_id ASC);
    *  - step t scores only candidates having ≥1 pair to a selected row
    *    (the distributed inner join's semantics), with
    *    obj = lam * cos − (1−lam) * maxsim in the same double op order;
    *  - ordering uses java.lang.Double.compare — Spark's double ordering
    *    (NaN greatest, −0.0 < 0.0) — and ties break by vec_id ASC;
    *  - per-(a,b) duplicate sims fold by max, as the distributed
    *    groupBy(max) would.
    * Bails (None → distributed path) on a disabled/exceeded gate, non-
    * (long, long, double) schemas, any null, or a duplicate candidate id
    * within a query. MmrDriverFinishSpec pins driver ≡ distributed. */
  private def mmrDriver(base: DataFrame, pairs: DataFrame, k: Int,
      lam: Double): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val spark = base.sparkSession
    val lim = spark.conf.get(MmrSmallKey, "500000").toLong
    if (lim <= 0) return None
    val bs = base.schema
    val ps = pairs.schema
    if (bs(0).dataType != LongType || bs(1).dataType != LongType ||
        bs(2).dataType != DoubleType || ps(0).dataType != LongType ||
        ps(1).dataType != LongType || ps(2).dataType != LongType ||
        ps(3).dataType != DoubleType) return None
    // both frames are localCheckpointed — the exact counts are cheap
    if (base.count() > lim || pairs.count() > lim) return None
    val bRows = base.collect()
    val pRows = pairs.collect()
    if (bRows.exists(r => r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2)) ||
        pRows.exists(r => r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2) ||
          r.isNullAt(3))) return None
    // candidates per query; bail on duplicate ids (row_number would pick
    // one arbitrarily-but-deterministically; don't replicate that corner)
    val byQ = new java.util.LinkedHashMap[Long,
      scala.collection.mutable.ArrayBuffer[(Long, Double)]]()
    for (r <- bRows) {
      val buf = byQ.computeIfAbsent(r.getLong(0),
        _ => scala.collection.mutable.ArrayBuffer.empty)
      buf += ((r.getLong(1), r.getDouble(2)))
    }
    val it0 = byQ.values().iterator()
    while (it0.hasNext) {
      val buf = it0.next()
      if (buf.map(_._1).distinct.size != buf.size) return None
    }
    // per-query (a, b) -> sim, duplicates folded by Double.compare-max
    val sim = new java.util.HashMap[(Long, Long, Long), Double]()
    for (r <- pRows) {
      val key = (r.getLong(0), r.getLong(1), r.getLong(2))
      val v = r.getDouble(3)
      if (!sim.containsKey(key) ||
          java.lang.Double.compare(v, sim.get(key)) > 0)
        sim.put(key, v)
    }
    val om = 1 - lam
    val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
    val qIt = byQ.entrySet().iterator()
    while (qIt.hasNext) {
      val e = qIt.next()
      val qid = e.getKey
      val cands = e.getValue
      // step 1: (cos DESC, vec_id ASC)
      var best = cands.head
      for (c <- cands.tail) {
        val cmp = java.lang.Double.compare(c._2, best._2)
        if (cmp > 0 || (cmp == 0 && c._1 < best._1)) best = c
      }
      out.add(org.apache.spark.sql.Row(qid, best._1, 1L))
      val remaining = scala.collection.mutable.LinkedHashMap(
        cands.filter(_ != best).map(c => c._1 -> c._2).toSeq: _*)
      // maxsim per remaining candidate, present only once a pair to a
      // selected row exists (inner-join semantics)
      val maxsim = scala.collection.mutable.HashMap.empty[Long, Double]
      def admit(selectedId: Long): Unit = remaining.keysIterator.foreach { a =>
        val key = (qid, a, selectedId)
        if (sim.containsKey(key)) {
          val s = sim.get(key)
          maxsim.get(a) match {
            case Some(old) if java.lang.Double.compare(s, old) <= 0 => ()
            case _ => maxsim(a) = s
          }
        }
      }
      admit(best._1)
      var t = 2
      var done = false
      while (t <= k && !done) {
        var bestId = -1L
        var bestObj = 0.0
        var have = false
        remaining.foreach { case (a, cos) =>
          maxsim.get(a) match {
            case Some(ms) =>
              val obj = lam * cos - om * ms
              val cmp = if (!have) 1 else java.lang.Double.compare(obj, bestObj)
              if (cmp > 0 || (cmp == 0 && a < bestId)) {
                bestId = a; bestObj = obj; have = true
              }
            case None => ()
          }
        }
        if (!have) done = true
        else {
          out.add(org.apache.spark.sql.Row(qid, bestId, t.toLong))
          remaining.remove(bestId)
          maxsim.remove(bestId)
          admit(bestId)
          t += 1
        }
      }
    }
    val schema = StructType(Seq(bs(0), bs(1),
      StructField("mmr_rank", LongType, nullable = false)))
    Some(spark.createDataFrame(out, schema))
  }

  /** Streaming retrieval: query vectors arrive as a STREAM and are scored
    * against the static corpus. Retrieval is stateless per query — a
    * query's top-k is complete the moment its own rows are seen — so the
    * right streaming posture is a per-micro-batch batch join (foreachBatch
    * running the exact [[topKBruteForce]] plan on the batch's queries),
    * NOT a stateful streaming aggregate: no state store, no watermark, and
    * each appended result is final on commit. At scale the static side
    * stays partition-resident across batches while only the trickle of new
    * queries broadcasts — the same shape the batch operator already has.
    * The returned query must be awaited/stopped by the caller; results
    * land in `outPath` as appended parquet. */
  def topKStreamToParquet(corpus: DataFrame, queryStream: DataFrame, k: Int,
      outPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        topKBruteForce(corpus, batch.toDF(), k)
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** Streaming retrieval riding the PERSISTED IVF INDEX — the
    * [[topKStreamToParquet]] posture with the index posture's economics
    * (r13 VERDICT "Next round" #7): each micro-batch's queries probe via
    * [[topKIvfIndexed]] inside foreachBatch, so every batch pays only the
    * probed lists' bucket-pruned scan — never a full-corpus brute pass —
    * with zero training jobs and no state store (retrieval is stateless
    * per query; the index IS the state, maintained by the append/rebuild
    * machinery). Per-query results are independent of batching, so the
    * streamed union is row-identical to one batch probe of all queries
    * (IvfIndexSpec pins it). */
  def topKStreamIndexedToParquet(spark: SparkSession, table: String,
      queryStream: DataFrame, k: Int, nProbe: Int, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        topKIvfIndexed(spark, table, batch.toDF(), k, nProbe)
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** LSH-bucketed ANN: corpus bucketed once per table by banded
    * random-hyperplane signatures; each query probes, per table, its own
    * bucket plus all hamming-1 neighbor buckets (multi-probe). A corpus
    * vector is scored if it shares a probed bucket in ANY table; exact
    * cosine ranks within the probed buckets.
    *
    * `nBits <= 0` (default) derives bucket width from the corpus count
    * ([[Dedup.nBitsFor]]) so bucket occupancy — the per-probe scan cost —
    * stays constant as the corpus grows; `nTables` independent plane
    * families hold recall up as nBits grows (the minhash-band trick).
    * Pass `n` (the corpus row count) when known to skip the count() job —
    * for a filtered/computed corpus that job re-runs the upstream plan. */
  def topKLsh(emb: DataFrame, queries: DataFrame, k: Int = 5, nBits: Int = 0,
      dim: Int = 64, nTables: Int = 2, n: Long = -1L): DataFrame = {
    Dedup.validateDim(emb, dim)
    val bits = if (nBits > 0) nBits else Dedup.nBitsFor(if (n > 0) n else emb.count())
    // the probes side is broadcast, so carrying v through the bucket
    // explode keeps the corpus map-side (never shuffled)
    val corpus = Dedup.multiTableBuckets(
      emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      bits, dim, nTables, carry = Seq("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    // per-table query signature, bound once, then exploded into the probe
    // set: own bucket + each single-bit flip (qbucket is a bound attribute
    // here, so the flips are cheap bitwise ops, not signature recomputes)
    val qb = q.select(col("query_id"), col("qv"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"),
          Dedup.hyperplaneBucket(col("qv"), bits, dim, t).as("qbucket"))): _*)).as("tb"))
      .select(col("query_id"), col("qv"), col("tb.t").as("t"), col("tb.qbucket").as("qbucket"))
    val probes = qb.select(col("query_id"), col("qv"), col("t"),
      explode(concat(array(col("qbucket")),
        transform(sequence(lit(0), lit(bits - 1)),
          i => col("qbucket").bitwiseXOR(call_function("shiftleft", lit(1L), i))))).as("bucket"))
    val scored = corpus.join(broadcast(probes), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    // dedup inside the partial aggregator: a (query, vec) pair colliding in
    // several tables/probes scores identically, so the k-bounded buffer
    // keeps one copy — no separate distinct() exchange of the candidate set
    selectTopK(scored, k, dedup = true)
  }

  // ------------------------------------------------------------------
  // IVF (inverted-file) ANN — the coarse-quantizer scale path
  // ------------------------------------------------------------------

  /** Work gate (sample rows × centroids) below which Lloyd's runs as an
    * in-driver loop on one collected sample — a few ms of arithmetic vs
    * `iters` scheduled jobs. Above it, training distributes. */
  private[operators] val driverLoopMaxWork: Long = 500000L

  /** In-driver Lloyd's on a collected sample (the small-configuration
    * fast path): same init (first nCentroids of the hash-ordered sample),
    * same tie and empty-cluster rules as the distributed path. */
  private def lloydLocal(
      sample: Array[Array[Double]], nCentroids: Int, iters: Int)
      : Array[Array[Double]] = {
    var centroids = sample.take(nCentroids)
    val dim = centroids(0).length
    (0 until iters).foreach { _ =>
      val sums = Array.fill(nCentroids)(new Array[Double](dim))
      val counts = new Array[Long](nCentroids)
      sample.foreach { v =>
        val best = bestCentroid(v, centroids)
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old // empty cluster keeps its centroid
        else {
          val mean = sums(c).map(_ / counts(c))
          val n = math.sqrt(mean.map(x => x * x).sum)
          if (n == 0.0) old else mean.map(_ / n)
        }
      }
    }
    centroids
  }

  /** Best-centroid index for vector `a` — lowest index wins ties; zero-norm
    * vectors (cosine undefined) return -1. Shared by training and the
    * callers' assignment guards so every stage agrees on placement. */
  private[operators] def bestCentroid(
      a: Array[Double], centroids: Array[Array[Double]]): Int = {
    val naFull = { var s = 0.0; var i = 0; while (i < a.length) { s += a(i) * a(i); i += 1 }; s }
    if (naFull == 0.0) return -1
    var best = 0; var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val b = centroids(c)
      // fold ALL THREE sums over the same min length, exactly like
      // CosineSim.compute — on a dim mismatch the driver-side assignment
      // here and the distributed withCid assignment must agree, not
      // silently diverge on a full-length vs truncated query norm
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val s = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  /** Deterministic spherical k-means centroids (Lloyd's, fixed iterations)
    * trained on a hash-selected SAMPLE of the corpus, with the per-iteration
    * work DISTRIBUTED.
    *
    * The sample is the ~`sampleSize` non-zero vectors with the smallest
    * xxhash64(vec_id) — a uniform, reproducible draw with no RNG state.
    * The threshold hash is found with one TakeOrdered over the 8-byte hash
    * column only (never the vectors); the sample is cached as an RDD and
    * each Lloyd's iteration is ONE RDD job (no AQE stage-splits): the
    * E-step (nearest centroid against a broadcast of the current
    * centroids) and per-partition partial sums run map-side; partials
    * merge per cluster in partition-id order — on the driver when
    * nPartitions × k × dim is small (the common case; the merge is pure
    * addition), through one shuffle otherwise — so float accumulation
    * order, and with it the result, is deterministic run-to-run. The
    * driver only ever holds k × dim centroid doubles plus bounded
    * partials, so `nCentroids` scales to the paper-sized 50k clusters
    * (SemDeDup, arXiv:2303.09540) that the earlier driver-side loop
    * (O(sample × k × dim × iters) single-threaded, sample hard-capped at
    * 4096) could not reach.
    *
    * `sampleSize <= 0` (default) auto-scales the sample with the requested
    * resolution: max(4096, 32 × nCentroids). Initialization = first
    * nCentroids of the hash-ordered sample, as before.
    *
    * Tiny configurations (sample × nCentroids below [[driverLoopMaxWork]],
    * e.g. the default 16-centroid SemDeDup) short-circuit to a single
    * TakeOrdered job + an in-driver loop — at that size the whole E+M step
    * is a few ms and per-iteration job scheduling would dominate; the
    * distributed path is the uncapped scale lever, not a tax on small k. */
  def trainCentroids(
      emb: DataFrame,
      nCentroids: Int,
      iters: Int = 3,
      sampleSize: Int = 0): Array[Array[Double]] = {
    val targetSample =
      if (sampleSize > 0) sampleSize else math.max(4096, 32 * nCentroids)
    require(targetSample >= nCentroids,
      s"sampleSize $targetSample < nCentroids $nCentroids")
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      // zero-norm vectors can't vote (cosine undefined) and, worse, a
      // zero-norm INITIAL centroid would NaN every score — keep them out
      .filter(aggregate(col("v"), lit(0.0), (a, x) => a + x * x) > 0)
      .withColumn("h", xxhash64(col("vec_id").cast("string")))
    if (targetSample.toLong * nCentroids <= driverLoopMaxWork) {
      val sampleArr: Array[Array[Double]] = corpus
        .orderBy(col("h"), col("vec_id")).limit(targetSample)
        .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
      require(sampleArr.nonEmpty, "trainCentroids: corpus has no non-zero vectors")
      return lloydLocal(sampleArr, nCentroids, iters)
    }
    // hash threshold via TakeOrdered over (hash, id) pairs only — the
    // vectors themselves never sort or collect
    val bound = corpus.select(col("h"), col("vec_id"))
      .orderBy(col("h"), col("vec_id")).limit(targetSample)
      .collect()
    require(bound.nonEmpty, "trainCentroids: corpus has no non-zero vectors")
    val (hMax, idMax) = (bound.last.getLong(0), bound.last.getLong(1))
    val sample: org.apache.spark.rdd.RDD[((Long, Long), Array[Double])] = corpus
      .filter(col("h") < hMax || (col("h") === hMax && col("vec_id") <= idMax))
      .select(col("h"), col("vec_id"), col("v"))
      .as[(Long, Long, Array[Double])]
      .rdd.map { case (h, id, v) => ((h, id), v) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Array[Array[Double]] =
        sample.takeOrdered(nCentroids)(Ordering.by(_._1)).map(_._2)
      val dim = centroids(0).length
      val nPart = sample.getNumPartitions
      (0 until iters).foreach { _ =>
        val bc = spark.sparkContext.broadcast(centroids)
        // E-step + per-partition partial M-step in one map pass
        val raw = sample.mapPartitionsWithIndex { (pid, it) =>
          val cs = bc.value
          val sums = new java.util.HashMap[Int, (Array[Double], Array[Long])]()
          it.foreach { case (_, v) =>
            val cid = bestCentroid(v, cs)
            val cell = sums.computeIfAbsent(cid,
              _ => (new Array[Double](v.length), new Array[Long](1)))
            var j = 0
            while (j < v.length) { cell._1(j) += v(j); j += 1 }
            cell._2(0) += 1L
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Array[Double], Long)]
          sums.forEach { (cid, cell) => out += ((pid, cid, cell._1, cell._2(0))) }
          out.iterator
        }
        // merge per-cluster in (cid, pid) order — deterministic float
        // accumulation either way; driver-side when the worst-case partial
        // volume is small (one job, pure addition), one shuffle otherwise
        def mergeSorted(parts: Array[(Int, Int, Array[Double], Long)])
            : (Array[Double], Long) = {
          val acc = new Array[Double](dim)
          var cnt = 0L
          parts.foreach { case (_, _, s, c) =>
            var j = 0
            while (j < dim) { acc(j) += s(j); j += 1 }
            cnt += c
          }
          (acc, cnt)
        }
        val smallPartials =
          nPart.toLong * nCentroids * dim * 8L <= 64L * 1024 * 1024
        val byCid: Map[Int, (Array[Double], Long)] =
          if (smallPartials)
            raw.collect().groupBy(_._2)
              .map { case (cid, ps) => cid -> mergeSorted(ps.sortBy(_._1)) }
          else
            raw.map(t => (t._2, t))
              .groupByKey()
              .map { case (cid, ps) => (cid, mergeSorted(ps.toArray.sortBy(_._1))) }
              .collect().toMap
        bc.destroy()
        centroids = centroids.zipWithIndex.map { case (old, c) =>
          byCid.get(c) match {
            case None => old // empty cluster keeps its centroid
            case Some((s, cnt)) =>
              val mean = s.map(_ / cnt)
              val n = math.sqrt(mean.map(x => x * x).sum)
              if (n == 0.0) old else mean.map(_ / n)
          }
        }
      }
      centroids
    } finally { sample.unpersist(); () }
  }

  /** IVF ANN: assign the corpus to its nearest centroid ONCE (one map
    * pass), then each query probes only its `nProbe` closest centroids'
    * inverted lists — the corpus shuffle is a single int-keyed
    * partitioning, and query cost scales with nProbe/nCentroids of the
    * data. Exact cosine ranks within the probed lists. */
  def topKIvf(
      spark: SparkSession,
      emb: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val centroids = trainCentroids(emb, nCentroids)
    val cLit = typedLit(centroids.map(_.toSeq).toSeq)
    val corpus = withCid(
      emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      "v", cLit)
      // zero-norm vectors (cid -1) have no cosine neighborhood: no probe
      // ever visits them, so drop them from the inverted lists up front
      .filter(col("cid") >= 0)
    val probes = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
      .withColumn("scores", transform(cLit, c => Dedup.cosine(col("qv"), c)))
      .withColumn("cid", explode(slice(
        // centroid ids sorted by query-to-centroid similarity, best first
        transform(array_sort(zip_with(col("scores"),
          sequence(lit(0), lit(nCentroids - 1)),
          (s, i) => struct((-s).as("negs"), i.as("i")))), p => p.getField("i")),
        1, nProbe)))
      .select(col("query_id"), col("qv"), col("cid").cast("int").as("cid"))
    val scored = corpus.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    // (query, vec) pairs are unique — each corpus vector lives in exactly
    // one inverted list and probes carry distinct (query, cid) rows
    selectTopK(scored, k)
  }

  /** Adds a nearest-centroid `cid` column: argmax of cosine against the
    * broadcast centroid literals, lowest index on ties (matching
    * [[bestCentroid]]). The per-centroid score array is BOUND to its own
    * projection first, so the k cosines are computed once per row, not once
    * per downstream reference. A zero-norm vector scores NaN against every
    * centroid — `array_max` propagates the NaN and `array_position` would
    * silently map it to cid -1, pooling all zero vectors into one
    * pseudo-cluster whose O(size²) pair join defeats the occupancy bound —
    * so those rows get an EXPLICIT cid -1 for callers to filter. */
  private[operators] def withCid(
      df: DataFrame, vCol: String, cLit: Column): DataFrame =
    df.withColumn("scores", transform(cLit, c => Dedup.cosine(col(vCol), c)))
      .withColumn("cid",
        when(isnan(element_at(col("scores"), 1)), lit(-1))
          .otherwise(array_position(col("scores"), array_max(col("scores"))) - 1)
          .cast("int"))
      .drop("scores")

  // ------------------------------------------------------------------
  // Product quantization (PQ) — the compressed-codes ANN scale path
  // ------------------------------------------------------------------

  /** Plain (L2) Lloyd's on a local sample — the PQ sub-quantizer trainer.
    * PQ codebooks are inherently tiny (m × k × subDim doubles; k <= 256),
    * trained on a bounded sample: the DISTRIBUTED part of PQ is corpus
    * encoding and the code scan, not codebook fitting. Lowest index wins
    * assignment ties; empty clusters keep their centroid. */
  private def lloydL2(
      sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    var centroids = sample.take(k)
    val dim = centroids(0).length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    (0 until iters).foreach { _ =>
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < centroids.length) {
          val dd = d2(v, centroids(c))
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** L2-normalized corpus projection (unit vectors make cosine an inner
    * product — the PQ/ADC precondition). Zero vectors pass through. */
  private def unitVectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("__v"))
      .withColumn("__n", l2Norm(col("__v")))
      .select(col("vec_id"), l2Normalize(col("__v"), col("__n")).as("v"))

  /** PQ codebooks: `m` subspaces × `k` sub-centroids each, trained with
    * plain k-means on the hash-ordered sample of the UNIT corpus (PQ for
    * cosine = inner-product PQ on normalized vectors). Returns
    * books(m)(c) = sub-centroid vector. */
  def trainPqCodebooks(emb: DataFrame, m: Int = 8, k: Int = 16,
      iters: Int = 10, sampleSize: Int = 4096): Array[Array[Array[Double]]] = {
    val sample: Array[Array[Double]] = unitVectors(emb)
      .withColumn("__h", xxhash64(col("vec_id").cast("string")))
      .orderBy(col("__h"), col("vec_id")).limit(sampleSize)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "trainPqCodebooks: empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    // the m sub-quantizer fits are INDEPENDENT k-means problems — run them
    // on driver threads (deterministic: each subspace's arithmetic is
    // self-contained, output order is by subspace index). At the default
    // m=16 × k=32 × 10 iters the serial loop was the PQ faces' largest
    // driver-side cost.
    val out = new Array[Array[Array[Double]]](m)
    val threads = (0 until m).map { mi =>
      new Thread(() => {
        out(mi) = lloydL2(sample.map(_.slice(mi * sub, (mi + 1) * sub)), k, iters)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    out
  }

  /** Encode the corpus to PQ codes: per subspace, the index of the nearest
    * (L2) sub-centroid — a MAP-ONLY pass producing m small ints per vector
    * (the 8-64x compression that lets an ANN shortlist scan live in memory
    * at 100 TB). Backed by the fused codegen expression
    * [[graft.functions.PqEncode]]: the earlier composed form (16 chained
    * `transform(slice → zip_with → aggregate)` projections) was
    * bit-identical but evaluated interpreted and dominated the face. */
  def pqEncode(emb: DataFrame, books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val k = books(0).length
    val sub = books(0)(0).length
    val flat = new Array[Double](m * k * sub)
    var i = 0
    books.foreach(_.foreach(_.foreach { x => flat(i) = x; i += 1 }))
    unitVectors(emb).select(col("vec_id"),
      graft.functions.GraftFunctions.pq_encode(col("v"), flat, m, k, sub)
        .as("codes"))
  }

  /** PQ ANN with asymmetric-distance (ADC) shortlist + exact rerank: each
    * query precomputes an m × k table of sub-inner-products against the
    * codebooks (driver-side, tiny), the corpus CODES are scanned with a
    * per-code table lookup (never the vectors), the top `rerank`
    * candidates per query are then rescored with exact cosine on the
    * original vectors, and the true top `k` of the shortlist is returned.
    * Scale shape: the scan touches m bytes per corpus row; only
    * queries × rerank full vectors are ever rescored.
    *
    * Defaults (m=16 × k=32 = 16 B/vector, 32× over 64 raw doubles;
    * rerank=96) are sized for this corpus's near-uniform embeddings — the
    * hard case, where coarse sub-quantizers blur everything: 8×16 codes
    * measured 0.35-0.53 recall@5 on the real tables, 16×32+rerank 96
    * measures 1.00 (certified >= 0.8 per round by sim_topk_pq_check).
    * Clustered real-world embeddings tolerate far coarser settings. */
  def topKPq(spark: SparkSession, emb: DataFrame, queries: DataFrame,
      k: Int = 5, m: Int = 16, kSub: Int = 32, rerank: Int = 96): DataFrame = {
    import spark.implicits._
    val books = trainPqCodebooks(emb, m, kSub)
    val sub = books(0)(0).length
    val codes = pqEncode(emb, books)
    // per-query ADC tables: table(m)(c) = <q_m, book_m_c> on the UNIT query
    val qRows = unitVectors(queries).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qTables: Seq[(Long, Seq[Seq[Double]])] = qRows.toSeq.map { case (qid, qv) =>
      qid -> books.zipWithIndex.map { case (book, mi) =>
        book.map { c =>
          var s = 0.0; var i = 0
          while (i < sub) { s += qv(mi * sub + i) * c(i); i += 1 }
          s
        }.toSeq
      }.toSeq
    }
    val qDf = qTables.toDF("query_id", "qtable")
    val scored = codes.join(broadcast(qDf), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.GraftFunctions.adc_score(col("codes"), col("qtable"))
          .as("adc"))
    // shortlist selection is the SAME partial top-k as brute force: each
    // partition of the code scan reduces to <= rerank ADC rows per query
    // map-side — the n × q scored set is never exchanged (a row_number
    // window here would shuffle everything the m-bytes/row scan saved)
    val shortlist = selectTopK(scored.withColumnRenamed("adc", "cos"), rerank)
      .select(col("query_id"), col("vec_id"))
    // exact rerank on the shortlist only
    val v = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    val exact = shortlist
      .join(v, "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    selectTopK(exact, k)
  }

  /** IVF-PQ: the two scale levers COMPOSED (the FAISS IndexIVFPQ posture).
    * The coarse quantizer buckets the corpus into `nCentroids` inverted
    * lists; every vector also carries its PQ codes. A query probes its
    * `nProbe` nearest lists and ADC-scans ONLY those lists' codes — at
    * 100 TB the scan touches (nProbe/nCentroids) × m bytes per corpus row
    * — then the shortlist reranks with exact cosine. Vectors are PQ-coded
    * directly (not as centroid residuals): the exact rerank absorbs the
    * extra quantization error the residual trick would remove, for one
    * less moving part. */
  def topKIvfPq(spark: SparkSession, emb: DataFrame, queries: DataFrame,
      k: Int = 5, nCentroids: Int = 16, nProbe: Int = 8,
      m: Int = 16, kSub: Int = 32, rerank: Int = 96): DataFrame = {
    import spark.implicits._
    val centroids = trainCentroids(emb, nCentroids)
    val cLit = typedLit(centroids.map(_.toSeq).toSeq)
    val books = trainPqCodebooks(emb, m, kSub)
    val sub = books(0)(0).length
    val flat = new Array[Double](m * kSub * sub)
    var fi = 0
    books.foreach(_.foreach(_.foreach { x => flat(fi) = x; fi += 1 }))
    // one map pass builds BOTH index sides: coarse list id + PQ codes
    val encoded = withCid(
      emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      "v", cLit)
      .filter(col("cid") >= 0)
      .withColumn("__n", l2Norm(col("v")))
      .select(col("vec_id"), col("cid"),
        graft.functions.GraftFunctions.pq_encode(
          l2Normalize(col("v"), col("__n")), flat, m, kSub, sub).as("codes"))
    // per-query: nProbe nearest coarse lists + the ADC table (driver-side,
    // queries are a bounded set by contract)
    val qRows = unitVectors(queries).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probes = qRows.toSeq.flatMap { case (qid, qv) =>
      val order = centroids.zipWithIndex.map { case (c, ci) =>
        (bestDot(qv, c), ci)
      }.sortBy { case (s, ci) => (-s, ci) }.take(nProbe).map(_._2)
      val table: Seq[Seq[Double]] = books.zipWithIndex.map { case (book, mi) =>
        book.map { c =>
          var s = 0.0; var i = 0
          while (i < sub) { s += qv(mi * sub + i) * c(i); i += 1 }
          s
        }.toSeq
      }.toSeq
      order.map(ci => (qid, ci, table))
    }
    val pDf = probes.toDF("query_id", "cid", "qtable")
    val scored = encoded.join(broadcast(pDf), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.GraftFunctions.adc_score(col("codes"), col("qtable"))
          .as("adc"))
    // probed-list ADC rows reduce to <= rerank per query map-side — same
    // partial-selection shape as flat PQ, on the already-bounded scan
    val shortlist = selectTopK(scored.withColumnRenamed("adc", "cos"), rerank)
      .select(col("query_id"), col("vec_id"))
    val v = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    val exact = shortlist
      .join(v, "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    selectTopK(exact, k)
  }

  // ------------------------------------------------------------------
  // Persisted IVF index — pay training + encoding ONCE, probe forever
  // ------------------------------------------------------------------

  /** Job-group tag set on every index-BUILD Spark job (training + encode
    * + write). The probe path must never schedule a job in this group —
    * IvfIndexSpec listens for it, turning "the probe retrains" into a red
    * spec instead of a silent 100 TB anti-pattern. */
  val BuildJobGroup = "graft.ann.index.build"

  /** Build and persist the IVF index — the [[graft.operators.Dedup
    * .writeSeenIndex]] posture applied to similarity. At 100 TB the corpus
    * ENCODE is the expensive pass (one full scan + centroid assignment);
    * it must be paid once at index-build time, not per query batch, which
    * is exactly what every `sim_topk_{ivf,pq,ivfpq}` invocation was doing
    * (the r9 VERDICT's top item).
    *
    * Layout: one row per corpus vector — (vec_id, cid, v, codes) —
    * BUCKETED + sorted by `cid`, so (a) each inverted list is physically
    * co-located (a probe's file reads are `nProbe` lists, not the corpus:
    * Spark prunes buckets on the probe's `cid IN (...)` filter), and
    * (b) any future list-keyed join reads the index pre-partitioned. Rows
    * carry BOTH the full vector (the FAISS IndexIVFFlat posture — exact
    * cosine within probed lists) and the PQ codes (the IndexIVFPQ posture
    * — m-byte ADC scans); a columnar scan reads only the column its probe
    * uses. Centroids and PQ codebooks land in a `<table>_meta` sidecar
    * (nCentroids + m×kSub rows — driver-collectable at any corpus size).
    *
    * Determinism: training is the same hash-seeded Lloyd's the transient
    * faces use, so an index rebuilt from the same corpus is bit-identical
    * and a probe of the index equals the transient [[topKIvf]] exactly
    * (spec-pinned). */
  def writeIvfIndex(spark: SparkSession, emb: DataFrame, table: String,
      path: String, nCentroids: Int = 16, m: Int = 16, kSub: Int = 32,
      buckets: Int = 8): Unit = {
    import spark.implicits._
    // save the caller's job group/description so the finally RESTORES
    // rather than clobbers it (clearJobGroup would untag every job the
    // caller schedules after the build)
    val prevGroup = spark.sparkContext.getLocalProperty("spark.jobGroup.id")
    val prevDesc = spark.sparkContext.getLocalProperty("spark.job.description")
    spark.sparkContext.setJobGroup(BuildJobGroup,
      s"IVF index build: $table", interruptOnCancel = false)
    try {
      val centroids = trainCentroids(emb, nCentroids)
      val books = trainPqCodebooks(emb, m, kSub)
      val sub = books(0)(0).length
      val flat = new Array[Double](m * kSub * sub)
      var fi = 0
      books.foreach(_.foreach(_.foreach { x => flat(fi) = x; fi += 1 }))
      // one map pass builds every index column: coarse list id, the raw
      // vector, and the PQ codes of its unit form
      val encoded = withCid(
        emb.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
        "v", typedLit(centroids.map(_.toSeq).toSeq))
        .filter(col("cid") >= 0)
        .withColumn("__n", l2Norm(col("v")))
        .select(col("vec_id"), col("cid"), col("v"),
          graft.functions.GraftFunctions.pq_encode(
            l2Normalize(col("v"), col("__n")), flat, m, kSub, sub).as("codes"),
          lit(0L).as("gen"))
      encoded.write.bucketBy(buckets, "cid").sortBy("cid")
        .option("path", path).mode("overwrite").saveAsTable(table)
      val metaRows: Seq[(String, Int, Int, Seq[Double])] =
        centroids.zipWithIndex.toSeq.map { case (c, i) =>
          ("centroid", i, 0, c.toSeq)
        } ++
        books.zipWithIndex.toSeq.flatMap { case (book, mi) =>
          book.zipWithIndex.toSeq.map { case (bc, ci) =>
            ("book", mi, ci, bc.toSeq)
          }
        }
      metaRows.toDF("kind", "i", "j", "v").coalesce(1)
        .write.option("path", path + "_meta")
        .mode("overwrite").saveAsTable(table + "_meta")
    } finally {
      spark.sparkContext.setLocalProperty("spark.jobGroup.id", prevGroup)
      spark.sparkContext.setLocalProperty("spark.job.description", prevDesc)
    }
  }

  /** Sidecar read-back: (centroids, PQ codebooks) — bounded rows, the only
    * driver-side state a probe or append ever holds. */
  private def readIndexMeta(spark: SparkSession, table: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val rows = spark.table(table + "_meta")
      .select(col("kind"), col("i"), col("j"), col("v")).collect()
    val centroids = rows.filter(_.getString(0) == "centroid")
      .map(r => (r.getInt(1), r.getSeq[Double](3).toArray))
      .sortBy(_._1).map(_._2)
    val bookRows = rows.filter(_.getString(0) == "book")
    val m = bookRows.map(_.getInt(1)).max + 1
    val k = bookRows.map(_.getInt(2)).max + 1
    val books = Array.ofDim[Array[Double]](m, k)
    bookRows.foreach { r =>
      books(r.getInt(1))(r.getInt(2)) = r.getSeq[Double](3).toArray
    }
    (centroids, books)
  }

  /** RIGHT-TO-BE-FORGOTTEN for the IVF index — the third leg of the
    * purge story beside [[graft.operators.Dedup.forgetDigests]] and
    * [[graft.operators.TextOps.forgetTextIndex]]: drop the forgotten
    * vectors' index rows (one bucketed anti-join — delta-proportional
    * shuffle, vectors of other lists copy through untouched) and keep
    * the sidecar VERBATIM — unlike the text index there is no per-row
    * global statistic to fix (an IVF posting carries only its own list
    * id / vector / codes), and centroids/codebooks deliberately stay:
    * retraining on purges is the same deliberate, drift-gated event as
    * on appends ([[rebuildIvfIndexIfDrifted]]). A probe of the purged
    * index is therefore EXACTLY an IVF probe of the reduced corpus
    * under the original quantizers. */
  def forgetIvfIndex(spark: SparkSession, oldTable: String,
      dropIds: DataFrame, newTable: String, path: String,
      buckets: Int = 8): Unit = {
    spark.table(oldTable)
      .join(dropIds.select(col("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      .write.bucketBy(buckets, "cid").sortBy("cid")
      .option("path", path).mode("overwrite").saveAsTable(newTable)
    spark.table(oldTable + "_meta").coalesce(1)
      .write.option("path", path + "_meta")
      .mode("overwrite").saveAsTable(newTable + "_meta")
  }

  /** Append a DELTA of vectors to a persisted IVF index WITHOUT
    * retraining — the [[graft.operators.Dedup.incrementalIndexed]]
    * append-back posture for similarity: the sidecar's existing centroids
    * assign the delta's list ids and its codebooks encode the delta's PQ
    * codes in ONE map pass (no Lloyd's, no codebook fits — nothing runs in
    * [[BuildJobGroup]]), and the rows append in the index's own bucketing,
    * so probes see the union immediately with unchanged plan shape. The
    * standard IVF trade rides along: appended vectors quantize against the
    * ORIGINAL codebooks, so a drifting distribution eventually wants a
    * rebuild — the rebuild stays a deliberate, paid-once event instead of
    * a per-query tax. Every append RETURNS the post-append [[IvfDrift]]
    * (appended fraction in basis points) so callers can gate that event
    * on a measured number ([[rebuildIvfIndexIfDrifted]]) instead of
    * guessing (r11 VERDICT #7). */
  def appendIvfIndex(spark: SparkSession, emb: DataFrame, table: String,
      buckets: Int = 8): IvfDrift = {
    // fail actionably, not with an AnalysisException mid-append: an index
    // persisted before the drift metric existed has no `gen` column and
    // must be rebuilt once before deltas can append (r12 ADVICE #3)
    require(spark.table(table).columns.contains("gen"),
      s"IVF index '$table' predates the drift metric (no `gen` column); " +
        "rebuild it once via writeIvfIndex before appending deltas")
    val (centroids, books) = readIndexMeta(spark, table)
    val m = books.length
    val kSub = books(0).length
    val sub = books(0)(0).length
    val flat = new Array[Double](m * kSub * sub)
    var fi = 0
    books.foreach(_.foreach(_.foreach { x => flat(fi) = x; fi += 1 }))
    val path = spark.sql(s"DESCRIBE TABLE EXTENDED $table").collect()
      .find(_.getString(0) == "Location").map(_.getString(1))
      .getOrElse(throw new IllegalStateException(s"no location for $table"))
    // idempotence: a retried/repeated append must not double-insert — a
    // duplicated vec_id would occupy two of a probe's k slots with the
    // same neighbor and silently push a true one out. The anti-join reads
    // only the index's id column; the delta (small by posture) shuffles.
    withCid(
      emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
        .join(spark.table(table).select(col("vec_id")),
          Seq("vec_id"), "left_anti"),
      "v", typedLit(centroids.map(_.toSeq).toSeq))
      .filter(col("cid") >= 0)
      .withColumn("__n", l2Norm(col("v")))
      .select(col("vec_id"), col("cid"), col("v"),
        graft.functions.GraftFunctions.pq_encode(
          l2Normalize(col("v"), col("__n")), flat, m, kSub, sub).as("codes"),
        lit(1L).as("gen"))
      .write.bucketBy(buckets, "cid").sortBy("cid")
      .option("path", path).mode("append").saveAsTable(table)
    ivfDrift(spark, table)
  }

  /** Drift posture of a persisted index: how much of it quantizes against
    * codebooks it was not trained on. Appended rows carry `gen` = 1 (build
    * rows 0), so the statistic is one columnar aggregate of two small
    * columns — no vectors read. `appended_bp` (basis points) is the
    * rebuild lever: r10's #209 documented that appended vectors ride
    * STALE codebooks "until a deliberate rebuild" but nothing measured
    * the staleness; now every append returns it and
    * [[rebuildIvfIndexIfDrifted]] turns the threshold into the deliberate
    * rebuild. */
  final case class IvfDrift(nTotal: Long, nAppended: Long, appendedBp: Long)

  def ivfDrift(spark: SparkSession, table: String): IvfDrift = {
    val t = spark.table(table)
    // a pre-`gen` index (persisted before the drift metric existed) is
    // all build rows by definition — treat missing `gen` as gen 0
    // instead of failing the first append/drift read (r12 ADVICE #3)
    val genCol = if (t.columns.contains("gen")) col("gen") else lit(0L)
    val r = t
      .agg(count(lit(1)).cast("long"),
        sum(when(genCol > 0, 1L).otherwise(0L)).cast("long"))
      .collect()(0)
    val total = r.getLong(0)
    val app = if (r.isNullAt(1)) 0L else r.getLong(1)
    IvfDrift(total, app, if (total == 0) 0L else app * 10000L / total)
  }

  /** The deliberate rebuild, gated on measured drift: when the appended
    * fraction exceeds `maxAppendedBp` basis points, retrain + re-encode
    * the FULL corpus (`emb` — the lake table, not the index; a rebuild
    * re-reads the source of truth) into the same table/path and reset
    * every row to gen 0. Returns true iff the rebuild ran. Training
    * happens only here and in [[writeIvfIndex]] — both inside
    * [[BuildJobGroup]], so the probe-path no-training spec discipline
    * keeps holding. */
  def rebuildIvfIndexIfDrifted(spark: SparkSession, emb: DataFrame,
      table: String, path: String, maxAppendedBp: Long,
      nCentroids: Int = 16, m: Int = 16, kSub: Int = 32,
      buckets: Int = 8): Boolean = {
    val drift = ivfDrift(spark, table)
    if (drift.appendedBp <= maxAppendedBp) false
    else {
      writeIvfIndex(spark, emb, table, path, nCentroids, m, kSub, buckets)
      true
    }
  }

  /** ADC probe of the persisted index — the IVFPQ posture over the SAME
    * layout [[topKIvfIndexed]] exact-probes: the probed lists' CODES
    * column is ADC-scanned (m bytes per row at scale; the columnar scan
    * never touches `v` on this pass), the per-partition shortlist reduces
    * map-side to `rerank` rows per query, and the exact rerank re-opens
    * ONLY the probed buckets' vector column filtered by the broadcast
    * shortlist. Zero training jobs by construction (same no-corpus API);
    * two k-bounded shuffles total — the shortlist and final top-k
    * selections. With equal settings the result is row-identical to the
    * transient [[topKIvfPq]] (same training, encode, probe order and
    * rerank arithmetic). */
  def topKIvfPqIndexed(spark: SparkSession, table: String,
      queries: DataFrame, k: Int = 5, nProbe: Int = 8,
      rerank: Int = 96): DataFrame = {
    import spark.implicits._
    val (centroids, books) = readIndexMeta(spark, table)
    val sub = books(0)(0).length
    val qRows = unitVectors(queries).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probes = qRows.toSeq.flatMap { case (qid, qv) =>
      val order = centroids.zipWithIndex.map { case (c, ci) =>
        (bestDot(qv, c), ci)
      }.sortBy { case (s, ci) => (-s, ci) }.take(nProbe).map(_._2)
      val tab: Seq[Seq[Double]] = books.zipWithIndex.map { case (book, mi) =>
        book.map { c =>
          var s = 0.0; var i = 0
          while (i < sub) { s += qv(mi * sub + i) * c(i); i += 1 }
          s
        }.toSeq
      }.toSeq
      order.map(ci => (qid, ci, tab))
    }
    val pDf = probes.toDF("query_id", "cid", "qtable")
    val probedCids = probes.map(_._2).distinct.sorted
    val probed = spark.table(table)
      .filter(col("cid").isin(probedCids.map(Int.box): _*))
    val scored = probed.select(col("vec_id"), col("cid"), col("codes"))
      .join(broadcast(pDf), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.GraftFunctions.adc_score(col("codes"), col("qtable"))
          .as("cos"))
    val shortlist = selectTopK(scored, rerank)
      .select(col("query_id"), col("vec_id"))
    // exact rerank: shortlist rows live in probed lists by construction,
    // so the vector read is the probed buckets' `v` column only
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    val exact = probed.select(col("vec_id"), col("v"))
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    selectTopK(exact, k)
  }

  /** Probe the persisted IVF index: NO training jobs, NO corpus encode —
    * the API takes only the index table and the queries, so the probe
    * path cannot retrain by construction. Per query: order the sidecar
    * centroids by cosine driver-side (queries are a bounded set by
    * contract, same as the PQ faces), scan ONLY the probed lists (the
    * `cid IN (...)` filter bucket-prunes the index scan), broadcast-join
    * the probes, exact-cosine within the lists, and partial-top-k select.
    * EXACTLY ONE shuffle on the whole path — the k-bounded selectTopK
    * exchange (spec-asserted); the index side never moves.
    *
    * With the same (nCentroids, nProbe) the result is row-identical to
    * the transient [[topKIvf]] — same training, same assignment, same
    * probe ordering and tie-breaks — minus its per-invocation training
    * and encode jobs. */
  def topKIvfIndexed(spark: SparkSession, table: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val centroids = spark.table(table + "_meta")
      .filter(col("kind") === "centroid")
      .select(col("i"), col("v")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
    val qRows = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probes: Seq[(Long, Int, Seq[Double])] = qRows.toSeq.flatMap {
      case (qid, qv) =>
        centroids.zipWithIndex.map { case (c, ci) => (bestDot(qv, c), ci) }
          .sortBy { case (s, ci) => (-s, ci) }.take(nProbe)
          .map { case (_, ci) => (qid, ci, qv.toSeq) }
    }
    val pDf = probes.toDF("query_id", "cid", "qv")
    val probedCids = probes.map(_._2).distinct.sorted
    val scored = spark.table(table)
      // driver-known probe set → IN-list on the bucket column: the scan
      // reads only the probed lists' buckets (SelectedBucketsCount in the
      // plan), not the corpus
      .filter(col("cid").isin(probedCids.map(Int.box): _*))
      .join(broadcast(pDf), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    selectTopK(scored, k)
  }

  /** Cosine of a query against a (unit-normalized) centroid, guarding
    * zero norms — the driver-side probe-ordering helper. */
  private def bestDot(q: Array[Double], c: Array[Double]): Double = {
    var dot = 0.0; var nq = 0.0; var nc = 0.0; var i = 0
    val n = math.min(q.length, c.length)
    while (i < n) { dot += q(i) * c(i); nq += q(i) * q(i); nc += c(i) * c(i); i += 1 }
    if (nq == 0.0 || nc == 0.0) 0.0 else dot / (math.sqrt(nq) * math.sqrt(nc))
  }

  /** L2 norm of a double-array vector, folded in element order — the same
    * sequential accumulation every engine's list-sum uses, so the value is
    * bit-identical cross-engine. */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))

  /** L2-normalize a vector given its precomputed norm (bind the norm to a
    * column of the same projection — an inline l2Norm(v) would re-fold the
    * array once per element). Zero vectors pass through unchanged. */
  def l2Normalize(v: Column, norm: Column): Column =
    when(norm > 0, transform(v, x => x / norm)).otherwise(v)

  /** Symmetric int8 scalar quantization of a double-array vector:
    * q_i = floor(x_i · 127 / max|x| + 0.5), the 4× storage reduction an
    * ANN corpus takes before sharding (dequantize with scale = max|x|/127).
    * Rounding is an explicit floor(+0.5) — round-half-up — so the result
    * is bit-identical in any engine computing in doubles (no dependence on
    * an engine's round() tie rule). Map-only; `maxAbs` must be the bound
    * column of the same projection (lambda re-evaluation pitfall). */
  def quantizeInt8(v: Column, maxAbs: Column): Column =
    transform(v, x =>
      when(maxAbs > 0, floor(x * lit(127.0) / maxAbs + lit(0.5)).cast("long"))
        .otherwise(lit(0L)))
}
