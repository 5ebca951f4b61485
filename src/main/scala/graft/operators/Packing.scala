package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing and stratified sampling — the batch-assembly steps
  * between a cleaned corpus and a training run.
  */
object Packing {

  /** Assign each document to a fixed-capacity bin by cumulative token
    * count: the deterministic greedy packing that turns a corpus into
    * training sequences. Documents are ordered by content hash (stable
    * across runs and engines) WITHIN `shards` hash shards, and a document
    * whose cumulative count crosses a capacity boundary starts the next
    * bin — the standard one-pass approximation (a bin may overflow by at
    * most one document's tokens; exact bin packing is NP-hard and
    * inherently sequential).
    *
    * Scale shape: the only shuffle is the window's partitioning on
    * `shard`, and the cumulative sum runs independently per shard — at
    * 100 TB you raise `shards` so each shard's sort fits an executor
    * (packing quality is per-shard, unaffected by shard count). A single
    * global ORDER BY window — the tempting formulation — would serialize
    * the entire corpus through one partition.
    */
  def packByTokens(docs: DataFrame, capacity: Long, shards: Int = 64,
      tokenCount: Column = null): DataFrame = {
    // `tokenCount` defaults to the whitespace proxy; pass the REAL subword
    // count (e.g. size(Bpe encode) — see BpeSpec) and the packing runs on
    // the token economics the model will actually see
    val nTokens = Option(tokenCount).getOrElse(TextOps.wsTokenCount(col("text")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs
      .select(col("doc_id"),
        nTokens.as("n_tokens"),
        // ordering key as 16 raw bytes: unsigned binary order == the md5
        // hex string's order (hex is nibble-monotone), so the DuckDB
        // oracle's ORDER BY md5(text) sees the identical sequence while
        // the window's exchange carries half the key bytes
        unhex(md5(col("text"))).as("h"),
        // key-mod sharding (not Murmur3 `hash`): bit-identical in any engine
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // bin = which capacity-span the PRE-document cumulative count lands
      // in; the doc that crosses a boundary opens the next bin
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(capacity.toDouble))
          .cast("long").as("bin"))
  }

  /** MATERIALIZE the packed sequences [[packByTokens]] assigns — the
    * concat step between bin assignment and tokenization: documents of a
    * (shard, bin) join into one training sequence in the SAME
    * content-hash order the cumulative binning used, separated by the
    * EOS sentinel. One shard-keyed window + one (shard, bin) aggregate;
    * per-group state is capacity-bounded (a bin holds ~capacity tokens
    * by construction), so the collect is safe at any corpus size —
    * the bin cap, not the data, bounds the group. */
  def packConcat(docs: DataFrame, capacity: Long, shards: Int = 64,
      sep: String = "<|eos|>"): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs
      .select(col("doc_id"), col("text"),
        TextOps.wsTokenCount(col("text")).as("n_tokens"),
        unhex(md5(col("text"))).as("h"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("text"), col("n_tokens"), col("h"),
        col("shard").cast("long").as("shard"),
        floor((col("cum") - col("n_tokens")) / lit(capacity.toDouble))
          .cast("long").as("bin"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("h"), col("doc_id"),
            col("text")))), s => s.getField("text")), sep).as("packed_text"))
  }

  /** Trim each stratum to a token budget: documents are taken in
    * content-hash order until the stratum's cumulative token count reaches
    * the budget (the crossing document is kept — the same pre-document
    * cumulative rule as [[packByTokens]]). The right-sizing step when
    * assembling a training mixture from unevenly sized sources. One
    * stratum-partitioned window, no global sort. */
  def budgetTrim(docs: DataFrame, stratum: Column, budgetTokens: Long,
      tokenCount: Column = null): DataFrame = {
    // binary digest ordering: same sequence as ORDER BY md5 hex (see
    // packByTokens), half the exchange key bytes
    val w = Window.partitionBy(stratum)
      .orderBy(unhex(md5(col("text"))), col("doc_id"))
    docs
      .withColumn("__nt",
        Option(tokenCount).getOrElse(TextOps.wsTokenCount(col("text"))))
      .withColumn("__cum", sum(col("__nt")).over(w))
      .filter(col("__cum") - col("__nt") < budgetTokens)
      .drop("__nt", "__cum")
  }

  /** Rate-based mixture sampling: keep a deterministic content-hash
    * fraction of each row's stratum, with the rate supplied per row as a
    * 4-hex-digit threshold string (e.g. a CASE over `source`, or a joined
    * rate table rendered to hex) — "0400" keeps ≈1/16, "8000" keeps ≈1/2.
    * String comparison against the content hash means zero RNG state,
    * engine-identical decisions, and granularity 1/65536. A map-only
    * filter: the mixture step of a training run costs one projection. */
  def mixtureSample(docs: DataFrame, thresholdHex: Column): DataFrame =
    docs.filter(substring(md5(col("text")), 1, 4) < thresholdHex)

  /** Leakage-safe train/test split: assign every document to a split by
    * the content hash of its NEAR-DUP CLUSTER representative, not its own
    * id — a per-doc hash split puts near-duplicates of a test document in
    * the training set, and the eval silently measures memorization (the
    * decontamination failure mode, at split time). `clusterMap` is a
    * (doc_id, cluster_id) pair table (connectedComponents output);
    * unclustered docs coalesce to themselves, so singletons split
    * independently. `testHexDigits` of 16 sets the test share (3 → 3/16 ≈
    * 19%); md5's first hex digit is uniform and engine-identical, the
    * repo-wide deterministic-sampling idiom.
    *
    * Scale shape: one hash join against the cluster map (tiny — only
    * clustered docs hold rows, and it broadcasts below the threshold) and
    * a map-only split assignment. No shuffle of the corpus itself; every
    * cluster lands on one side BY CONSTRUCTION (split is a pure function
    * of the rep), so no cross-split validation pass is needed. */
  def leakFreeSplit(docs: DataFrame, clusterMap: DataFrame,
      testHexDigits: Int = 3): DataFrame = {
    val testChars = (0 until testHexDigits).map(_.toHexString)
    docs.join(clusterMap, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(substring(md5(col("rep").cast("string")), 1, 1)
          .isin(testChars: _*), lit("test")).otherwise(lit("train")))
      .drop("cluster_id")
  }

  /** Curriculum ordering: global difficulty rank + SQL-ntile phase
    * assignment — "train on easy documents first" needs every doc's global
    * position under the difficulty order, then equal-size phase buckets.
    * The rank comes from the distributed Ranked machinery (range
    * partitions + per-partition ranks + broadcast prefix — never a
    * single-task global window), and the ntile is computed FROM the rank
    * and the broadcast total with standard SQL ntile semantics (the first
    * `total % p` buckets take one extra row), so the output matches the
    * oracle's native `ntile(p) OVER (ORDER BY …)` exactly.
    *
    * Scale shape: one range exchange for the rank, a 1-row broadcast for
    * the total (pmod-derived join key — a literal key would constant-fold
    * and degrade the join to a nested loop), map-only phase arithmetic. */
  def curriculumPhases(docs: DataFrame, sort: Seq[Column], phases: Int,
      out: String = "phase"): DataFrame = {
    val ranked = Ranked.withGlobalRowNumber(docs, "rn", sort)
    val total = docs.agg(count(lit(1)).as("__cur_total"))
      .withColumn("__cur_k", expr("pmod(__cur_total, 1)"))
    ranked
      .withColumn("__cur_k", pmod(col("rn"), lit(1)))
      .join(broadcast(total), "__cur_k").drop("__cur_k")
      // first (total % p) buckets hold q+1 rows, the rest q — integer
      // arithmetic throughout (Column `/` would be double division)
      .withColumn(out, expr(
        s"""CAST(CASE WHEN rn <= ((__cur_total div $phases) + 1)
                           * (__cur_total % $phases)
                 THEN (rn - 1) div ((__cur_total div $phases) + 1) + 1
                 ELSE (__cur_total % $phases)
                      + (rn - ((__cur_total div $phases) + 1)
                              * (__cur_total % $phases) - 1)
                        div (__cur_total div $phases) + 1
                 END AS BIGINT)"""))
      .drop("__cur_total")
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis-Spirakis), integerized: A-Res ranks items by u^(1/w) with
    * u uniform — and u^(1/w) is exactly the distribution of the MAX of w
    * iid uniforms (P(max ≤ x) = x^w), so for integer weights the key is
    * max_{j=1..w} u_j with u_j drawn from md5(text, j). That removes every
    * transcendental from the rank key: pow/ln are libm-dependent and a
    * 1-ulp divergence near the k-boundary would flip the selected set
    * cross-engine, while 32-bit integer keys compare identically
    * everywhere. doc_id breaks the (astronomically unlikely) key ties.
    *
    * Scale shape: the per-doc key is a map-only higher-order-function
    * reduction (no explode — the corpus text is never duplicated), and
    * the selection is a global ORDER BY + LIMIT, which Spark plans as
    * TakeOrderedAndProject (per-partition top-k heaps, k rows to the
    * driver-side merge — never a full sort). */
  def weightedSample(docs: DataFrame, weight: Column, k: Int): DataFrame =
    docs
      .withColumn("w", weight.cast("int"))
      // zero/negative weights mean "never sample" — they must be EXCLUDED
      // before the key: Spark's sequence(1, 0) yields a DESCENDING [1, 0]
      // array (a valid max-hash key, as if weight 2), while DuckDB's
      // generate_series(1, 0) is empty (NULL key), so an unfiltered w <= 0
      // row would both mis-sample and diverge cross-engine
      .filter(col("w") >= 1)
      .withColumn("skey", expr(
        """array_max(transform(sequence(1, w),
             j -> cast(conv(substring(md5(concat(text, '#', j)), 1, 8),
                            16, 10) AS BIGINT)))"""))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(k)

  /** Deterministic WEIGHTED INTERLEAVING — the training-ORDER builder
    * that runs after mixture sampling decides membership: source s emits
    * its r-th document (content-hash order) at virtual time
    * r·scale div w_s, so a weight-3 source appears 3× as often as a
    * weight-1 source in ANY window of the merged order (the classic
    * virtual-time fair scheduler, integerized — no floats, no RNG,
    * engine-exact). Within-source ranks and the global position both
    * ride the certified distributed [[Ranked]] machinery: never a
    * |sources|-partition window (a 20-source corpus would run 20 tasks),
    * never a single-task global sort. */
  def interleave(docs: DataFrame, weight: Column, sourceCol: String = "source",
      scale: Long = 1000000L): DataFrame = {
    val ranked = Ranked.withGroupRowNumber(
      // weight <= 0 means "never emit" — exclude BEFORE ranking (the
      // weightedSample discipline): a zero weight would divide the
      // virtual time to null and silently sort those rows first
      docs.withColumn("w", weight.cast("long")).filter(col("w") >= 1),
      "rn", sourceCol,
      Seq(unhex(md5(col("text"))).asc, col("doc_id").asc))
    Ranked.withGlobalRowNumber(
      ranked.withColumn("vt", expr(s"rn * ${scale}L div w")),
      "pos", Seq(col("vt").asc, col(sourceCol).asc, col("rn").asc))
  }

  /** Deterministic FRACTIONAL upsampling — "2.5 epochs of the high-quality
    * source": every doc gets floor(factor) full copies, and a
    * content-hash-selected frac(factor) share gets one more, so the
    * expected stratum size is exactly factor × n with zero RNG state and
    * engine-identical row sets. The companion of [[mixtureSample]]
    * (downsampling) — together they implement an arbitrary per-source
    * mixture weight ≥ 0. Output carries an `epoch` column (0-based copy
    * index) so a downstream shard shuffle can interleave epochs instead of
    * replaying them back-to-back.
    *
    * Exactness contract (same discipline as the temperature face): factor
    * must be a dyadic-rational expression (x.5, x.25, …) — floor is exact,
    * the fractional part is exact, ×65536 is a power of two, and the
    * 4-hex-digit threshold compare is the shared mixtureSample idiom.
    * Scale shape: map-only projection + explode; no shuffle, no state —
    * output size is the only cost, which is the point of the operator. */
  def upsample(docs: DataFrame, factor: Column): DataFrame = {
    val whole = floor(factor).cast("int")
    val fracTh = lpad(lower(hex(
      floor((factor - floor(factor)) * lit(65536.0)).cast("long"))), 4, "0")
    val extra = when(substring(md5(col("text")), 1, 4) < fracTh, 1)
      .otherwise(0)
    docs
      .withColumn("__copies", whole + extra)
      .filter(col("__copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Exactly `n` documents per stratum (e.g. per source), chosen by
    * deterministic content-hash rank — reproducible across runs and
    * engines, no RNG state. The rank window partitions by the stratum, so
    * work distributes across strata; within one stratum the sort is the
    * price of exact-N (for rate-based sampling at unbounded scale, hash
    * thresholding — `q_sample_hash` — needs no sort at all).
    */
  def stratifiedSample(docs: DataFrame, stratum: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(unhex(md5(col("text"))), col("doc_id"))
    docs
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Per-domain frequency capping: keep at most `cap` documents per
    * stratum, the best-scoring first (score desc, doc_id asc — a total
    * order, so the kept set is engine-exact). The over-represented-domain
    * guard every crawl pipeline applies before training (a handful of
    * boilerplate-heavy hosts would otherwise dominate the mixture).
    *
    * Scale shape: selection rides the native bounded top-k aggregate
    * ([[graft.functions.TopKSelect]]) — each partition reduces a stratum
    * to at most `cap` (score, id) entries BEFORE the exchange, so the one
    * shuffle moves ≤ cap-sized buffers per (stratum, partition) instead of
    * every row the way a rank window would (the window form shuffles and
    * sorts the full 100 TB corpus; this moves ~cap × n_partitions rows per
    * domain, and a hot domain's buffers merge associatively). Returns
    * (stratum, rank, doc_id, score) in rank order per stratum.
    */
  def capPerStratum(docs: DataFrame, stratum: Column, cap: Int,
      score: Column): DataFrame =
    docs
      .groupBy(stratum.as("stratum"))
      .agg(graft.functions.GraftFunctions.topk_select(
        struct(col("doc_id").as("vec_id"), score.cast("double").as("cos")),
        cap, dedup = false).as("topk"))
      .select(col("stratum"), posexplode(col("topk")).as(Seq("__r", "__s")))
      .select(col("stratum"), (col("__r") + 1).as("rank"),
        col("__s.vec_id").as("doc_id"), col("__s.cos").as("score"))
}
