package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (SURVEY.md §2.3
  * #36-40). The design constraint at 100 TB is: NEVER generate the O(n²)
  * pair space. Every near-dup family below reduces pair generation to an
  * equi-join on a bucket key (shared shingle, LSH band, simhash chunk,
  * hyperplane bucket), verifies the exact metric on candidates only, and
  * keeps signature computation a single map-side pass of codegen'd
  * higher-order functions (no UDFs, no driver collects).
  */
object Dedup {

  /** Size gate for [[connectedComponents]]'s driver finish — see the
    * inline doc at its use site. Exact row count of the persisted
    * pre-contraction star map; 0 disables the driver path. */
  val CcSmallStarsKey = "spark.graft.cc.smallStars"

  // ------------------------------------------------------------------
  // shared shingling
  // ------------------------------------------------------------------

  /** Distinct word 3-gram shingles from an already-materialized token-array
    * column. IMPORTANT: `toks` must be a bound attribute (a named column
    * from a projection), not an inline `split(...)` expression — the lambda
    * references it 3× per shingle position, and an inline expression would
    * be re-evaluated every time (measured: the whole-text regex split ran
    * 3 × n_shingles times per row, dominating the near-dup operators). */
  def shinglesFromToks(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Distinct word 3-gram shingles of `text` (convenience; see
    * shinglesFromToks for the fast path used by the operators). */
  def shingles(text: Column): Column = shinglesFromToks(split(lower(text), " +"))

  /** (doc_id, shingle) exploded — the join-side representation. The token
    * split is bound to a column of its own projection so it is computed
    * once per row. */
  private def explodedShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(lower(col("text")), " +").as("__toks"))
      .select(col("doc_id"), explode(shinglesFromToks(col("__toks"))).as("shingle"))

  /** Exact word-3-gram Jaccard for explicit candidate pairs (da < db) via
    * double shingle join + group — exact verification touches candidates
    * only, never the corpus crossproduct. */
  def pairJaccard(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val sh = explodedShingles(docs)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("da"), col("shingle")), "da")
      .join(sh.select(col("doc_id").as("db"), col("shingle")), Seq("db", "shingle"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("szb")), "db")
      .select(col("da"), col("db"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("j"))
  }

  // ------------------------------------------------------------------
  // §2.3 #36 exact dedup
  // ------------------------------------------------------------------

  /** Exact dedup by content hash: one shuffle on the 128-bit digest; at
    * 100 TB this is the only dedup that sees every byte, and it sees it in
    * one map pass. Keeps the smallest doc_id per content group.
    *
    * `h` is the digest as 16 RAW BYTES (`unhex(md5(...))`) — the md5 hex
    * STRING is 32 UTF8 chars, twice the bytes on the one exchange this
    * operator performs at 100 TB. Faces that display the digest re-hex at
    * output (`lower(hex(h))` == `md5(text)` exactly), which is
    * output-sized work, not shuffle-sized. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(unhex(md5(col("text"))).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------------
  // §2.3 #37 n-gram Jaccard near-dup
  // ------------------------------------------------------------------

  /** Near-dup pairs with exact word-3-gram Jaccard >= threshold. Candidate
    * pairs come from the shared-shingle equi-join (docs sharing no shingle
    * can't exceed 0 Jaccard), so the pair space is bounded by co-occurrence,
    * not n²; intersection counts fall directly out of the join's groupBy —
    * no second verification pass touches the data.
    *
    * `maxShingleDf` drops shingles whose document frequency exceeds the cap
    * BEFORE the self-join — the 100 TB skew lever: one boilerplate shingle
    * shared by df documents alone generates df² candidate pairs, and real
    * corpora always have boilerplate. The cap applies to sizes and
    * intersections alike, so `j` is the exact Jaccard over the
    * sub-boilerplate shingle sets (a well-defined semantic the DuckDB
    * oracle mirrors bit-for-bit). The df window shuffles on `shingle`,
    * the same partitioning the self-join needs, so Spark reuses the
    * exchange — the cap costs no extra shuffle of the shingle stream.
    * (Measured alternative: heavy-hitter aggregate + anti-join avoids
    * WindowExec's sort/buffer but recomputes and reshuffles the expensive
    * shingle explode for the aggregate — 2.1x slower at sf0.1.)
    * `maxShingleDf <= 0` disables the cap.
    *
    * Measured alternatives (kept out deliberately): AllPairs-style prefix
    * filtering (order shingles globally, join only each doc's first
    * |S|-ceil(t|S|)+1) — at sf0.1 it was 1.7-4x slower with per-pair work
    * dominating, and the r16 sf1 census killed it for pair volume too:
    * at t=0.3 prefixes keep 71% of rows, cut join volume only 1.8x
    * (7.8e7 of 1.38e8), and the candidate-DISTINCT alone costs more than
    * today's whole face (21.5 s), because co-shingle multiplicity is
    * ~1.2 — nearly every candidate pair shares exactly one shingle, so
    * prefix pruning can't collapse anything.
    *
    * The r16 replan (r15 VERDICT #2) attacks the volume itself:
    * EXACT-DUPLICATE COLLAPSE BEFORE PAIRING. A pair's Jaccard depends
    * only on the two shingle SETS, so all docs with identical text are
    * one pairing participant: the pipeline groups by content hash,
    * runs the shingle join over REPRESENTATIVES with the DF cap
    * WEIGHTED by group size (df must keep counting documents, not
    * distinct texts, or the cap boundary would move), and expands rep
    * pairs back to member pairs afterward (cross-group pairs inherit
    * the rep pair's j; within-group pairs are j = 1.0 exactly, emitted
    * only when the group's post-cap shingle set is non-empty — a doc
    * whose every shingle is capped away pairs with nothing, same as
    * the direct spelling). Exact-dup mass is precisely what real
    * corpora have at 100 TB, and what the synthetic sf1 tiling has
    * 10× of: measured sf1 (50k docs, 4,992 distinct texts), the
    * shingle-join volume drops ~100× and the dd_editdist face goes
    * 27.6 -> ~4 s; at sf0.1 (4,992 distinct of 5,000) the collapse is
    * a no-op and costs one slim corpus-sized exchange.
    *
    * Also measured and REJECTED at sf1 (so the next round doesn't
    * re-try them): packing (da, db) into one bigint aggregate key
    * (13.7 s one-off, 16-31 s across repeats — inside box noise);
    * carrying each doc's shingle array through the join for an inline
    * array_intersect (Σ sz² = 1.7e8 array cells through the exchange:
    * 255 s — docs average 52 shingles, not a handful); a
    * size-compatibility pre-filter (j <= min/max cuts only 7% — sizes
    * are homogeneous, median 52, p99 97); AllPairs prefix filtering
    * (see above). Output stays bit-identical to the direct spelling —
    * [[ngramJaccardGrouped]] is the executable spec,
    * DedupEquivalenceSpec pins them against each other.
    *
    * EAGER at construction: the adaptive gate runs one small stats job
    * (count + approx_count_distinct, memoized per plan+cap) when this
    * DataFrame is BUILT, so construction can launch a job and throw
    * where DataFrame construction is otherwise lazy. Same for
    * [[ngramContainment]], [[editDistNearDup]], [[ngramJaccardDelta]]. */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.6,
      maxShingleDf: Long = 1000L): DataFrame =
    if (shouldCollapse(docs)) {
      val c = collapseByContent(docs)
      val sh = repShingles(c, maxShingleDf)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val repPairs = repJaccardPairs(sh, sizes, threshold)
      expandRepPairs(c.members, sizes, repPairs,
        withinValues = Seq(lit(1.0).as("j")),
        withinKeep = threshold <= 1.0)
    } else ngramJaccardGrouped(docs, threshold, maxShingleDf)

  /** Collapse pays only with real duplicate mass: the collapsed plan
    * has ~4 more AQE stages (collapse exchange + expansion joins), a
    * FIXED latency that doubles a 2 s face at sf0.1 where 4,992 of
    * 5,000 texts are distinct, while at sf1 (4,992 of 50,000) it cuts
    * the pair join ~100x. The gate measures actual duplication with
    * one cheap map+aggregate pass (approx_count_distinct — the gate
    * picks between two EXACT plans, so 2% HLL error is harmless) and
    * collapses when distinct/total ≤ `spark.graft.jaccard.
    * collapseMaxDistinctRatio` (default 0.8; ≥1 forces collapse, ≤0
    * disables). The decision memoizes on the canonicalized input plan
    * — every face re-derives the same docs frame, and one stats job
    * per corpus per session is the honest price of an adaptive plan
    * (the pair join it sizes is superlinear in the duplication the
    * stats pass measures). Staleness caveat: a corpus REWRITTEN at the
    * same path mid-session keeps its memoized decision — both branches
    * are exact, so only plan choice (never output) can go stale. */
  private val collapseMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def shouldCollapse(docs: DataFrame): Boolean = {
    val ratioCap = docs.sparkSession.conf
      .getOption("spark.graft.jaccard.collapseMaxDistinctRatio")
      .map(_.toDouble).getOrElse(0.8)
    if (ratioCap >= 1.0) return true
    if (ratioCap <= 0.0) return false
    // Key = md5 of the full canonicalized plan (the 32-bit semanticHash
    // alone could merge gate decisions across unrelated corpora on a
    // collision) + the ratio cap (re-tuning the knob mid-session must
    // re-gate, not silently reuse the old decision) — r16 ADVICE items
    // 2-3.
    val plan = docs.queryExecution.analyzed.canonicalized
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(plan.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString + ":" + ratioCap
    val cached = collapseMemo.get(key)
    if (cached != null) return cached
    // Decide OUTSIDE the map: computeIfAbsent would hold the bucket lock
    // for the duration of a Spark job, blocking unrelated plan gating.
    // putIfAbsent accepts a rare duplicate stats job instead.
    val r = docs
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("text")).as("d"))
      .head()
    val n = r.getLong(0)
    val decision: java.lang.Boolean =
      n > 0 && r.getLong(1).toDouble / n <= ratioCap
    val prev = collapseMemo.putIfAbsent(key, decision)
    if (prev != null) prev else decision
  }

  /** Exact-content collapse: one representative doc per distinct text,
    * the member map, and the group size. md5(NULL) groups all
    * null-text docs — they shingle identically, so the grouping is a
    * refinement of shingle-set equality, which is all exactness needs.
    * The rep's text comes from a join on the min doc_id, not a string
    * MIN aggregate (string buffers force SortAggregate — a corpus sort
    * for nothing). */
  private[graft] case class Collapsed(reps: DataFrame, members: DataFrame)
  private[graft] def collapseByContent(docs: DataFrame): Collapsed = {
    // The group key must be NON-NULL: members re-joins groups on __h,
    // and an equi-join on a NULL key matches nothing — md5(NULL) = NULL
    // silently dropped every NULL-text doc from the member map (they
    // pair via the "" shingle in the direct spelling). "§null" cannot
    // collide with md5's hex alphabet.
    val hashed = docs.select(col("doc_id"), col("text"),
      coalesce(md5(col("text")), lit("§null")).as("__h"))
    val groups = hashed.groupBy(col("__h"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("gsz"))
    val reps = groups
      .join(hashed.select(col("doc_id").as("rep"), col("text")), Seq("rep"))
      .select(col("rep").as("doc_id"), col("text"), col("gsz"))
    val members = hashed.select(col("doc_id"), col("__h"))
      .join(groups.select(col("__h"), col("rep")), Seq("__h"))
      .select(col("rep"), col("doc_id"))
    Collapsed(reps, members)
  }

  /** Rep-level shingle stream under the GROUP-WEIGHTED df cap: df keeps
    * counting DOCUMENTS (Σ group sizes), not distinct texts, so the cap
    * boundary is exactly the direct spelling's. */
  private def repShingles(c: Collapsed, maxShingleDf: Long): DataFrame = {
    val all = c.reps
      .select(col("doc_id"), col("gsz"),
        split(lower(col("text")), " +").as("__toks"))
      .select(col("doc_id"), col("gsz"),
        explode(shinglesFromToks(col("__toks"))).as("shingle"))
    if (maxShingleDf <= 0) all.drop("gsz")
    else all
      .withColumn("__df",
        sum(col("gsz")).over(Window.partitionBy(col("shingle"))))
      .filter(col("__df") <= maxShingleDf)
      .select(col("doc_id"), col("shingle"))
  }

  /** The shared-shingle join + exact Jaccard over representatives. The
    * self-join carries a MERGE hint: the df-cap window already leaves
    * the stream exchange-partitioned AND sorted by shingle, so SMJ
    * reuses both for free, while the planner's post-aggregate size
    * estimates otherwise flip it to a broadcast whose driver-side map
    * build costs multiple seconds per derivation (measured at sf0.1:
    * 2.6 -> 8.8 s before the hint). */
  private def repJaccardPairs(sh: DataFrame, sizes: DataFrame,
      threshold: Double): DataFrame =
    sh.select(col("doc_id").as("da"), col("shingle")).hint("merge")
      .join(sh.select(col("doc_id").as("db"), col("shingle")), "shingle")
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("szb")), "db")
      .select(col("da"), col("db"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("j"))
      .filter(col("j") >= threshold)

  /** Expand rep-level pairs back to member pairs: cross-group pairs
    * inherit the rep pair's value column(s); within-group pairs get
    * `withinValue` (j = 1.0 / dist = 0 — a property of identical
    * texts), emitted only for groups whose post-cap shingle set is
    * non-empty (`sizes` semi-join: a doc whose every shingle was capped
    * away pairs with nothing, same as the direct spelling) and only
    * when `withinKeep` (the identical-pair value passes the operator's
    * own threshold). */
  private def expandRepPairs(members: DataFrame, sizes: DataFrame,
      repPairs: DataFrame, withinValues: Seq[Column], withinKeep: Boolean)
      : DataFrame = {
    val valueCols = repPairs.columns.filter(c => c != "da" && c != "db")
      .map(col).toSeq
    val cross = repPairs
      .join(members.select(col("rep").as("da"), col("doc_id").as("ia")), "da")
      .join(members.select(col("rep").as("db"), col("doc_id").as("ib")), "db")
      .select(least(col("ia"), col("ib")).as("da") +:
        greatest(col("ia"), col("ib")).as("db") +: valueCols: _*)
    if (!withinKeep) return cross
    val live = members
      .join(sizes.select(col("doc_id").as("rep")), Seq("rep"), "left_semi")
    val within = live.select(col("rep"), col("doc_id").as("ia"))
      .join(live.select(col("rep"), col("doc_id").as("ib")), "rep")
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("da") +: col("ib").as("db") +: withinValues: _*)
    cross.unionByName(within)
  }

  /** Candidate-generate + edit-distance verify as ONE collapsed
    * pipeline — the dd_editdist face's spelling. Semantically identical
    * to `editDistVerify(docs, ngramJaccard(docs, threshold))` (the
    * executable spec DedupEquivalenceSpec pins it to), but both stages
    * ride the SAME exact-content collapse: the distance is a property
    * of the two TEXTS, so rep pairs are verified once and member pairs
    * inherit, and a within-group pair is dist = 0 by identity. At sf1
    * (50k docs, 4,992 distinct texts) this is the difference between
    * normalizing/DP-ing 250k member pairs and 25k rep pairs. */
  def editDistNearDup(docs: DataFrame, threshold: Double = 0.3,
      maxShingleDf: Long = 1000L, prefixLen: Int = 80, maxDist: Int = 40)
      : DataFrame =
    if (shouldCollapse(docs)) {
      val c = collapseByContent(docs)
      val sh = repShingles(c, maxShingleDf)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val repPairs = repJaccardPairs(sh, sizes, threshold)
      val verified = editDistVerify(c.reps, repPairs, prefixLen, maxDist)
        .select(col("da"), col("db"), col("dist"))
      // NULL text is out-of-domain for the DISTANCE stage: the spec path
      // (editDistVerify over direct candidates) drops every pair whose
      // normalized prefix is NULL, so a group of duplicate NULL-text
      // docs must NOT emit within-group dist=0 pairs here (r16 ADVICE
      // medium — cross-group NULL pairs already die inside
      // editDistVerify's length band above).
      val verifiableSizes = sizes.join(
        c.reps.filter(col("text").isNotNull).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      expandRepPairs(c.members, verifiableSizes, verified,
        withinValues = Seq(lit(0).cast("integer").as("dist")),
        withinKeep = threshold <= 1.0 && maxDist >= 0)
    } else editDistVerify(docs,
      ngramJaccardGrouped(docs, threshold, maxShingleDf),
      prefixLen, maxDist)

  /** The shared DF-capped shingle stream (see [[ngramJaccard]]'s
    * `maxShingleDf` doc for the cap semantics). */
  private def cappedShingles(docs: DataFrame, maxShingleDf: Long): DataFrame = {
    val all = explodedShingles(docs)
    if (maxShingleDf <= 0) all
    else all
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("__df") <= maxShingleDf)
      .drop("__df")
  }

  /** The groupBy-count spelling of [[ngramJaccard]] — retained as the
    * executable spec the array-carrying plan is pinned bit-identical to
    * (the simhashDocsComposed posture). */
  private[graft] def ngramJaccardGrouped(docs: DataFrame,
      threshold: Double = 0.6, maxShingleDf: Long = 1000L): DataFrame = {
    val sh = cappedShingles(docs, maxShingleDf)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("doc_id").as("da"), col("shingle"))
      .join(sh.select(col("doc_id").as("db"), col("shingle")), "shingle")
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("szb")), "db")
      .select(col("da"), col("db"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("j"))
      .filter(col("j") >= threshold)
  }

  /** DELTA-SIDED exact Jaccard pairs: every ≥ threshold pair touching at
    * least one doc in `deltaIds`, with semantics IDENTICAL to
    * [[ngramJaccard]] over the full corpus (same full-corpus DF cap, same
    * sizes, same j arithmetic) — the pair source for
    * [[incrementalCluster]]. The probe side explodes only the DELTA
    * docs' shingles; the index side is the standing corpus's shingle
    * set, which at 100 TB is the persisted bucketed shingle index (the
    * minhashIncremental posture — here derived inline at test SF). A
    * delta-delta pair matches from both probes, so one orientation is
    * kept; delta-standing pairs match once. */
  def ngramJaccardDelta(all: DataFrame, deltaIds: DataFrame,
      threshold: Double = 0.6, maxShingleDf: Long = 1000L): DataFrame =
    if (shouldCollapse(all))
      ngramJaccardDeltaCollapsed(all, deltaIds, threshold, maxShingleDf)
    else ngramJaccardDeltaDirect(all, deltaIds, threshold, maxShingleDf)

  /** The direct (per-document) spelling of [[ngramJaccardDelta]] —
    * retained as the executable spec the collapsed plan is pinned
    * bit-identical to (DedupEquivalenceSpec). */
  private[graft] def ngramJaccardDeltaDirect(all: DataFrame,
      deltaIds: DataFrame, threshold: Double = 0.6,
      maxShingleDf: Long = 1000L): DataFrame = {
    val allSh = explodedShingles(all)
    val sh =
      if (maxShingleDf <= 0) allSh
      else allSh
        .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
        .filter(col("__df") <= maxShingleDf)
        .drop("__df")
    val flagged = sh
      .join(deltaIds.select(col("doc_id"), lit(true).as("__d")),
        Seq("doc_id"), "left")
      .withColumn("__d", coalesce(col("__d"), lit(false)))
    val sizes = flagged.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val probe = flagged.filter(col("__d"))
      .select(col("doc_id").as("dp"), col("shingle"))
    val index = flagged
      .select(col("doc_id").as("dx"), col("shingle"), col("__d").as("xd"))
    val inter = probe.join(index, "shingle")
      .filter(col("dp") =!= col("dx"))
      .filter(!col("xd") || col("dp") < col("dx"))
      .select(least(col("dp"), col("dx")).as("da"),
        greatest(col("dp"), col("dx")).as("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("szb")), "db")
      .select(col("da"), col("db"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("j"))
      .filter(col("j") >= threshold)
  }

  /** [[ngramJaccardDelta]] riding the exact-content collapse (r16
    * VERDICT #4): the delta probes the FULL corpus shingle set, so at
    * sf1 (50k docs, 4,992 distinct texts — real recrawls have the same
    * exact-dup bulk) the probe-side join volume is 10× what the
    * DISTINCT text mass needs. Collapse the corpus once, run the
    * delta pairing at REP level (a rep counts as delta when its group
    * holds ≥1 delta doc), then expand rep pairs back to member pairs
    * KEEPING only pairs that touch a delta doc — j is a function of the
    * two texts, so cross-group pairs inherit the rep pair's j and
    * within-group pairs are j = 1.0 by identity (emitted only for
    * groups whose post-cap shingle set is non-empty, and only when
    * threshold ≤ 1.0 — exactly the direct spelling's behavior). */
  private def ngramJaccardDeltaCollapsed(all: DataFrame,
      deltaIds: DataFrame, threshold: Double,
      maxShingleDf: Long): DataFrame = {
    val c = collapseByContent(all)
    val sh = repShingles(c, maxShingleDf)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val deltaReps = c.members
      .join(deltaIds.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("rep")).distinct()
    val flagged = sh.join(
        deltaReps.select(col("rep").as("doc_id"), lit(true).as("__d")),
        Seq("doc_id"), "left")
      .withColumn("__d", coalesce(col("__d"), lit(false)))
    val probe = flagged.filter(col("__d"))
      .select(col("doc_id").as("dp"), col("shingle"))
    val index = flagged
      .select(col("doc_id").as("dx"), col("shingle"), col("__d").as("xd"))
    val inter = probe.join(index, "shingle")
      .filter(col("dp") =!= col("dx"))
      .filter(!col("xd") || col("dp") < col("dx"))
      .select(least(col("dp"), col("dx")).as("da"),
        greatest(col("dp"), col("dx")).as("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    val repPairs = inter
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("szb")), "db")
      .select(col("da"), col("db"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("j"))
      .filter(col("j") >= threshold)
    // expansion, restricted to member pairs touching a delta doc
    val mem = c.members.join(
        deltaIds.select(col("doc_id"), lit(true).as("__d")),
        Seq("doc_id"), "left")
      .withColumn("__d", coalesce(col("__d"), lit(false)))
    val cross = repPairs
      .join(mem.select(col("rep").as("da"), col("doc_id").as("ia"),
        col("__d").as("pa")), "da")
      .join(mem.select(col("rep").as("db"), col("doc_id").as("ib"),
        col("__d").as("pb")), "db")
      .filter(col("pa") || col("pb"))
      .select(least(col("ia"), col("ib")).as("da"),
        greatest(col("ia"), col("ib")).as("db"), col("j"))
    if (threshold > 1.0) return cross // a within pair's j = 1.0 fails
    val live = mem.join(sizes.select(col("doc_id").as("rep")),
      Seq("rep"), "left_semi")
    val within = live
      .select(col("rep"), col("doc_id").as("ia"), col("__d").as("pa"))
      .join(live.select(col("rep"), col("doc_id").as("ib"),
        col("__d").as("pb")), "rep")
      .filter(col("ia") < col("ib"))
      .filter(col("pa") || col("pb"))
      .select(col("ia").as("da"), col("ib").as("db"), lit(1.0).as("j"))
    cross.unionByName(within)
  }

  /** INCREMENTAL near-dup clustering — IVM for the persisted cluster
    * map: merge a delta's pair stream into the standing clustering
    * WITHOUT re-deriving the standing pair graph. The old closure
    * re-enters as STAR EDGES (doc_id — cluster_id): connectivity-
    * equivalent to the standing pair graph but already contracted to
    * ≤ one edge per clustered doc, so the CC input is |map| + |delta
    * pairs| rows however large the historical graph was. Labels are
    * min-id on both paths, and stars preserve every old component, so
    * the result is BIT-IDENTICAL to a full recompute over (standing ∪
    * delta) pairs — the face's oracle replays exactly that from
    * scratch. */
  def incrementalCluster(clusterMap: DataFrame, deltaPairs: DataFrame): DataFrame = {
    val stars = clusterMap.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("da"), col("cluster_id").as("db"))
    connectedComponents(
      stars.unionByName(deltaPairs.select(col("da"), col("db"))))
  }

  /** Asymmetric n-gram CONTAINMENT pairs: |A∩B| / min(|A|,|B|) ≥
    * threshold — the quote/inclusion detector Jaccard near-dup MISSES by
    * construction (a short doc fully embedded in a long one has tiny
    * union-normalized similarity but containment 1.0; symmetric dedup
    * keeps both copies of the quoted text). Same shingle-join skeleton as
    * [[ngramJaccard]] — one equi-join on shingle, per-pair counts, sizes
    * joined back — so the scale posture (DF cap against hot-shingle skew,
    * never O(n²)) is inherited; only the denominator changes. Emits both
    * metrics so callers can split "contained" from "mutually similar". */
  def ngramContainment(docs: DataFrame, threshold: Double = 0.9,
      maxShingleDf: Long = 1000L): DataFrame =
    // containment and Jaccard are both functions of the two shingle
    // SETS, so the exact-dup collapse (see ngramJaccard) applies
    // verbatim: within-group pairs are c = 1.0, j = 1.0 by identity.
    // Measured at sf1: 20-30 s direct -> collapse-tier (the r16
    // full-surface sf1 line flagged this face 55x its sf0.1 time;
    // ngramContainmentGrouped is the pinned executable spec)
    if (shouldCollapse(docs)) {
      val c = collapseByContent(docs)
      val sh = repShingles(c, maxShingleDf)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val repPairs = repContainmentPairs(sh, sizes, threshold)
      expandRepPairs(c.members, sizes, repPairs,
        withinValues = Seq(lit(1.0).as("c"), lit(1.0).as("j")),
        withinKeep = threshold <= 1.0)
    } else ngramContainmentGrouped(docs, threshold, maxShingleDf)

  /** The direct spelling of [[ngramContainment]] — the executable spec
    * the collapsed plan is pinned bit-identical to. */
  private[graft] def ngramContainmentGrouped(docs: DataFrame,
      threshold: Double = 0.9, maxShingleDf: Long = 1000L): DataFrame = {
    val sh = cappedShingles(docs, maxShingleDf)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("doc_id").as("da"), col("shingle"))
      .join(sh.select(col("doc_id").as("db"), col("shingle")), "shingle")
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("szb")), "db")
      .select(col("da"), col("db"),
        (col("inter").cast("double") /
          least(col("sza"), col("szb")).cast("double")).as("c"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("j"))
      .filter(col("c") >= threshold)
  }

  /** Shared-shingle join + exact containment/Jaccard over reps. */
  private def repContainmentPairs(sh: DataFrame, sizes: DataFrame,
      threshold: Double): DataFrame =
    sh.select(col("doc_id").as("da"), col("shingle")).hint("merge")
      .join(sh.select(col("doc_id").as("db"), col("shingle")), "shingle")
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("szb")), "db")
      .select(col("da"), col("db"),
        (col("inter").cast("double") /
          least(col("sza"), col("szb")).cast("double")).as("c"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("j"))
      .filter(col("c") >= threshold)

  /** Connected components over a near-dup pair graph: every document gets
    * the MINIMUM doc_id reachable through pairs as its cluster id — the
    * step that turns pairwise near-dup output into dedup groups (keep one
    * survivor per cluster, usually the min id itself). Deterministic, so
    * it oracle-checks against a recursive-CTE closure.
    *
    * Scale shape, in three layers:
    *  1. per-partition union-find PRE-CONTRACTION — one shuffle-free map
    *     pass collapses each partition's local edges to member→min stars,
    *     so everything a single partition can see converges before the
    *     first global round (a chain living in one partition needs zero);
    *  2. min-label propagation with POINTER JUMPING over the stars — each
    *     round is one equi-join + min-aggregate (propagate one hop) plus
    *     one self-join (label := label(label), path doubling), so the
    *     residual cross-partition diameter converges in O(log) rounds
    *     (256-chain across 8 partitions: spec-pinned ≤ 6);
    *  3. ONE action per round — the localCheckpoint materialization both
    *     truncates lineage and fills the convergence accumulator, so no
    *     separate count() job pays the per-round scheduling cost twice. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // Phase 1 — per-partition union-find PRE-CONTRACTION: one map pass, no
    // shuffle. Each partition collapses its local edge structure into
    // member→min-root stars (path-halving find, union-by-min). Cross-
    // partition components stay connected because a node split across
    // partitions appears in several stars, and the stars share that node.
    // On a near-dup graph (short chains, dense stars) this leaves the
    // global loop 1-2 rounds of work instead of O(log diameter) from
    // scratch — and the per-round driver/job overhead, not the shuffled
    // bytes, is what dominated the old loop's wall clock.
    val star = pairs.select(col("da").cast("long"), col("db").cast("long"))
      .as[(Long, Long)].rdd.mapPartitions { it =>
        val parent = new java.util.HashMap[java.lang.Long, java.lang.Long]()
        def root(x0: Long): Long = {
          var x = x0
          var p = parent.get(x).longValue
          while (p != x) {
            val g = parent.get(p).longValue // path halving: parent(x) := grandparent
            parent.put(x, g)
            x = g
            p = parent.get(x).longValue
          }
          x
        }
        it.foreach { case (a, b) =>
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val ra = root(a); val rb = root(b)
          if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
        }
        // root() only re-puts EXISTING keys (path halving), so iterating the
        // key set while calling it is safe (no structural modification)
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
        val ks = parent.keySet.iterator()
        while (ks.hasNext) { val k = ks.next().longValue; out += ((k, root(k))) }
        out.iterator
      }.toDF("node", "root").persist()
    // r17 DRIVER FINISH (spark.graft.cc.smallStars, the Graph.SmallEdgesKey
    // discipline): the contracted star map is the SMALL representation of
    // the pair graph — when it fits (exact count of the persisted frame;
    // the distributed rounds would materialize it anyway), one driver
    // union-find replaces the whole pointer-jumping loop and its 2-4
    // scheduled jobs per round. Union-by-min + path halving over
    // (node, root) stars yields exactly the component-minimum label the
    // rounds converge to (CcDriverFinishSpec pins driver ≡ distributed).
    // Star rows are non-null longs by construction (built from the cast
    // RDD above), so no null-semantics gap exists on this path; above the
    // gate the rounds run unchanged.
    val ccLim = spark.conf.get(CcSmallStarsKey, "500000").toLong
    if (ccLim > 0 && star.count() <= ccLim) {
      val rows = star.select(col("node"), col("root")).as[(Long, Long)].collect()
      star.unpersist()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x0: Long): Long = {
        var x = x0
        var p = parent(x)
        while (p != x) {
          val g = parent(p) // path halving
          parent.update(x, g)
          x = g
          p = parent(x)
        }
        x
      }
      rows.foreach { case (n, r) =>
        if (!parent.contains(n)) parent.update(n, n)
        if (!parent.contains(r)) parent.update(r, r)
        val rn = find(n); val rr = find(r)
        if (rn < rr) parent.update(rr, rn)
        else if (rr < rn) parent.update(rn, rr)
      }
      val keys = parent.keysIterator.toArray
      val out = new java.util.ArrayList[org.apache.spark.sql.Row](keys.length)
      keys.foreach(k => out.add(org.apache.spark.sql.Row(k, find(k))))
      val lt = org.apache.spark.sql.types.LongType
      return spark.createDataFrame(out,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id", lt, nullable = false),
          org.apache.spark.sql.types.StructField("cluster_id", lt,
            nullable = false))))
    }
    // symmetric adjacency over the contracted stars; roots self-loop via
    // their own (root, root) row, so every node survives into the label set
    val edges = star.select(col("node").as("a"), col("root").as("b"))
      .union(star.select(col("root").as("a"), col("node").as("b")))
      .persist()
    try {
      // initial labels = one propagation round for free: each node's best
      // locally-known root
      var labels = edges.groupBy(col("a").as("node"))
        .agg(min(col("b")).as("label"))
        .localCheckpoint(true) // materializes edges (and through it, star)
      star.unpersist() // dead once edges is materialized
      var changed = 1L
      var i = 0
      var prevRound: org.apache.spark.rdd.RDD[(Long, Long)] = null
      while (changed > 0 && i < maxIter) {
        // best label reachable over one hop
        val prop = edges.join(labels, edges("b") === labels("node"))
          .groupBy(col("a")).agg(min(col("label")).as("hop"))
        // persist: the jump self-join reads `stepped` on BOTH sides (and on
        // different join keys, so exchange reuse can't apply); without the
        // cache the edges-join + min-aggregate would execute twice per round
        val stepped = labels
          .join(prop, labels("node") === prop("a"), "left")
          .select(labels("node"),
            least(labels("label"), coalesce(col("hop"), labels("label"))).as("mid"),
            labels("label").as("old"))
          .persist()
        // pointer jump: mid := label(mid). Labels only ever decrease and
        // label(x) <= x, so the jump is monotone and stays inside the
        // component; it is what turns O(diameter) rounds into O(log).
        val lookup = stepped.select(col("node").as("pnode"), col("mid").as("plabel"))
        // ONE action per round: the localCheckpoint materialization itself
        // fills the convergence accumulator, instead of a checkpoint job
        // plus a separate count() job (the old loop's second fixed cost).
        // A task retry can only inflate the count, never zero a genuinely
        // changed round, so the worst case is one extra (cheap) round.
        val acc = spark.sparkContext.longAccumulator("cc_changed")
        val round = stepped
          .join(lookup, stepped("mid") === lookup("pnode"), "left")
          .select(col("node"),
            least(col("mid"), coalesce(col("plabel"), col("mid"))).as("next"),
            col("old"))
          .as[(Long, Long, Long)].rdd
          .map { case (n, nx, o) => if (nx < o) acc.add(1L); (n, nx) }
        round.localCheckpoint()
        round.count() // materializes the round AND the accumulator
        stepped.unpersist()
        if (prevRound != null) prevRound.unpersist(false)
        prevRound = round
        changed = acc.value
        labels = round.toDF("node", "label")
        i += 1
      }
      // a silent cap would report one component as several — refuse instead
      if (changed > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds " +
            "(component diameter exceeds the cap); raise maxIter")
      labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
    } finally {
      edges.unpersist()
      star.unpersist() // idempotent if already released
    }
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minShared` word-3-gram shingles with any benchmark document — the
    * eval-set leakage check every training pipeline runs before a model
    * sees the data. Returns (doc_id, bench_id, n_shared) per contaminated
    * pair.
    *
    * Scale shape: the benchmark side is small by nature (eval sets are
    * thousands of docs, the corpus is billions), so its exploded shingles
    * broadcast and the corpus stream is a map-side join — the 100 TB side
    * is never shuffled. The equi-join is on the shingle itself; corpus
    * docs sharing nothing with the benchmark never materialize a row. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      minShared: Long = 3L): DataFrame = {
    val corpusSh = explodedShingles(corpus)
    val benchSh = explodedShingles(benchmark)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    corpusSh
      .join(broadcast(benchSh), "shingle")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ------------------------------------------------------------------
  // §2.3 #38 MinHash + LSH
  // ------------------------------------------------------------------

  /** LSH banded near-dup: minhash signature (k = bands * rowsPerBand
    * universal-hash rehashes, min per hash), explode into `bands`
    * band-hashes, equi-join on (band, band-hash) to get candidates, then
    * verify exact Jaccard on candidates only. */
  /** (doc_id, band, bh) LSH band keys: minhash signature (k = bands *
    * rowsPerBand rehashes, min per hash) sliced into per-band hashes.
    * The shared banding of [[minhashLsh]] (self-join dedup) and
    * [[decontaminateFuzzy]] (cross-set) — identical keys, so a pair
    * collides in one exactly when it collides in the other. */
  private def bandedKeys(docs: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame =
    bandedKeysSig(docs, bands, rowsPerBand).drop("sig")

  /** The k-position minhash signature, ONE fused byte-walk per document
    * ([[graft.functions.MinHashSig]], r17): an exchange-free projection
    * where the composed spelling below explodes shingles and aggregates
    * k `min` columns through a shuffle. The k universal rehashes are
    * `(h·A(i) + B(i)) mod P` — r17 also FIXED the rehash family here:
    * the old `h·(2i+1) + i·99991` had no outer mod, every position was
    * an order-preserving map of the same h, and the whole signature
    * collapsed to a function of the single min-hash shingle (banding's
    * S-curve degenerated to P[collide] = j). MinHashSig's scaladoc has
    * the full derivation; MinHashSigSpec pins fused ≡ composed. */
  private[graft] def minhashSig(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions.minhash_sig(
        coalesce(col("text"), lit("")), k).as("sig"))

  /** The executable spec of [[minhashSig]]: explode shingles, hash each
    * once, take k `min` aggregates (map-side combine keeps the shuffle
    * at one k-value row per doc per partition). The tempting all-array
    * formulation — transform(seq(0..k), i -> array_min(...)) —
    * re-evaluates the shingle-hash array k times per row and generates
    * pathological codegen; measured 60x slower. All arithmetic stays
    * below 2^62 (h < 2^31, A(i) < 2^31), so ANSI mode cannot overflow. */
  private[graft] def minhashSigComposed(docs: DataFrame, k: Int): DataFrame = {
    import graft.functions.{MinHashSig => MH}
    val sh = explodedShingles(docs)
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(MH.P)))
    val minCols = (0 until k).map(i =>
      min(pmod(col("h") * lit(MH.aCoef(i)) + lit(MH.bCoef(i)), lit(MH.P)))
        .as(s"m$i"))
    sh.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** [[bandedKeys]] with the full minhash signature carried on every band
    * row — the layout the PERSISTED band index stores, so an index hit can
    * estimate Jaccard (fraction of agreeing signature positions, Broder's
    * unbiased estimator) from the collision row alone, touching neither
    * corpus text nor corpus shingles. The ×bands duplication (k ints per
    * band row) is the price of a zero-extra-join probe; a side table keyed
    * by doc_id would trade one more delta-sided join for bands× less
    * storage. */
  private def bandedKeysSig(docs: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    val sig = minhashSig(docs, k)
    sig.select(col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",",
            transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
              v => v.cast("string")))).as("bh")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"),
        col("sig"))
  }

  /** Collapse-gated (r17, same [[shouldCollapse]] gate as the jaccard
    * family — see its scaladoc for the eager-stats-job note): at high
    * exact-dup mass the banding re-derives identical signatures and the
    * candidate verify re-joins identical texts per member; the collapsed
    * plan signatures/bands/verifies REPS once and expands, with the
    * bucket df cap weighted by group size so the cap boundary is exactly
    * the direct spelling's. DedupEquivalenceSpec pins the two
    * bit-identical. */
  def minhashLsh(
      docs: DataFrame,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.6,
      maxBucketDf: Long = 1000L): DataFrame =
    if (shouldCollapse(docs))
      minhashLshCollapsed(docs, bands, rowsPerBand, threshold, maxBucketDf)
    else minhashLshDirect(docs, bands, rowsPerBand, threshold, maxBucketDf)

  /** The direct (per-document) spelling of [[minhashLsh]] — retained as
    * the executable spec the collapsed plan is pinned bit-identical to. */
  private[graft] def minhashLshDirect(
      docs: DataFrame,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.6,
      maxBucketDf: Long = 1000L): DataFrame = {
    // adversarial-duplication guardrail (r12 brief #7): a band bucket
    // holding df documents alone generates df² candidate pairs, and an
    // all-identical corpus puts EVERY document in the same bucket of
    // every band — n² before the first verify. Buckets past the cap are
    // dropped before the self-join (the shingle-DF-cap semantic, one
    // level up): mega-buckets are boilerplate or exact-duplicate mass,
    // which exact dedup (content hash) owns. The df window shuffles on
    // (band, bh) — the join's own key — so the exchange is reused.
    // `maxBucketDf <= 0` disables the cap.
    val banded0 = bandedKeys(docs, bands, rowsPerBand)
    val banded =
      if (maxBucketDf <= 0) banded0
      else banded0
        .withColumn("__df",
          count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
        .filter(col("__df") <= maxBucketDf)
        .drop("__df")
    val cand = banded.select(col("doc_id").as("da"), col("band"), col("bh"))
      .join(banded.select(col("doc_id").as("db"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    pairJaccard(docs, cand).filter(col("j") >= threshold)
  }

  /** [[minhashLsh]] riding the exact-content collapse. Exactness
    * argument, piece by piece: (1) identical texts have identical
    * signatures, hence identical band keys — a rep's buckets are its
    * whole group's buckets, and weighting the bucket-df window by group
    * size reproduces the direct spelling's per-DOCUMENT bucket count
    * exactly; (2) a cross-group member pair (a', b') collides in a
    * surviving bucket iff its rep pair (a, b) does (same band hashes,
    * same bucket dfs), and its verified j is the rep pair's (j is a
    * function of the two texts); (3) a within-group pair is a candidate
    * iff ≥1 of the group's band buckets survives the cap (identical
    * docs collide in EVERY band), and verifies at exactly j = 1.0 (the
    * "" shingle makes every shingle set non-empty, so j = 1.0 holds for
    * NULL-text groups too — unlike the editDist family, the direct
    * spelling DOES emit those pairs and the collapse must match). */
  private def minhashLshCollapsed(
      docs: DataFrame,
      bands: Int,
      rowsPerBand: Int,
      threshold: Double,
      maxBucketDf: Long): DataFrame = {
    val c = collapseByContent(docs)
    val banded0 = bandedKeys(c.reps, bands, rowsPerBand)
      .join(c.reps.select(col("doc_id"), col("gsz")), Seq("doc_id"))
    val banded =
      if (maxBucketDf <= 0) banded0.drop("gsz")
      else banded0
        .withColumn("__df",
          sum(col("gsz")).over(Window.partitionBy(col("band"), col("bh"))))
        .filter(col("__df") <= maxBucketDf)
        .select(col("doc_id"), col("band"), col("bh"))
    val cand = banded.select(col("doc_id").as("da"), col("band"), col("bh"))
      .join(banded.select(col("doc_id").as("db"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    val repPairs = pairJaccard(c.reps.select(col("doc_id"), col("text")), cand)
      .filter(col("j") >= threshold)
    val live = banded.select(col("doc_id")).distinct()
    expandRepPairs(c.members, live, repPairs,
      withinValues = Seq(lit(1.0).as("j")),
      withinKeep = threshold <= 1.0)
  }

  /** Position-agreement count between two equal-length minhash
    * signatures — Broder's Jaccard estimator's numerator. Shared by
    * [[minhashIncremental]]'s index probe and [[minhashEstimate]]. */
  private[graft] def sigAgreement(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)

  /** Signature-ONLY Jaccard estimation over the LSH candidate pairs:
    * ĵ = |{i : sig_a(i) = sig_b(i)}| / k (Broder's unbiased estimator,
    * E[ĵ] = j when the k rehashes are independent permutations). This is
    * the zero-text-touch probe the persisted band index serves — at
    * 100 TB an estimate-grade dedup pass reads k longs per doc where
    * [[minhashLsh]]'s exact verify re-joins the corpus shingle stream.
    *
    * Meaningful only SINCE the r17 rehash-family repair: under the old
    * order-preserving family all k positions agreed exactly when the one
    * min-hash shingle agreed, so ĵ was binary {0, 1} — useless as an
    * estimator (the dd_minhash_estimate_check face certifies mean
    * absolute error and bias against exact Jaccard on the true pair
    * set every round, which would have caught that degeneracy). */
  def minhashEstimate(docs: DataFrame, bands: Int = 8, rowsPerBand: Int = 4,
      maxBucketDf: Long = 1000L): DataFrame = {
    val k = bands * rowsPerBand
    val banded0 = bandedKeysSig(docs, bands, rowsPerBand)
    val banded =
      if (maxBucketDf <= 0) banded0
      else banded0
        .withColumn("__df",
          count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
        .filter(col("__df") <= maxBucketDf)
        .drop("__df")
    // one row per candidate pair; the sigs ride the bucket join and the
    // multi-band dedup keeps any one copy (identical by construction)
    banded.select(col("doc_id").as("da"), col("band"), col("bh"),
        col("sig").as("siga"))
      .join(banded.select(col("doc_id").as("db"), col("band"), col("bh"),
        col("sig").as("sigb")), Seq("band", "bh"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(first(col("siga")).as("siga"), first(col("sigb")).as("sigb"))
      .select(col("da"), col("db"),
        (sigAgreement(col("siga"), col("sigb")).cast("double") / k)
          .as("j_est"))
  }

  /** Fuzzy benchmark decontamination: corpus documents within `threshold`
    * word-3-gram Jaccard of ANY benchmark document, found through the SAME
    * minhash banding as [[minhashLsh]] but across the two sets — the
    * paraphrased/near-verbatim eval leakage the exact shingle-overlap
    * check ([[decontaminate]]) misses.
    *
    * Scale shape mirrors the exact variant: the benchmark is small by
    * nature, so its band keys broadcast and candidate generation is a
    * map-side join over the corpus band stream — the 100 TB side is never
    * shuffled for candidates, and only candidate pairs (bounded by real
    * band collisions) enter the exact-Jaccard verify. Returns (doc_id,
    * bench_id, j) with j >= threshold. */
  def decontaminateFuzzy(corpus: DataFrame, benchmark: DataFrame,
      bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.6): DataFrame = {
    // disjoint id space for the union'd exact verify; benchmark ids are
    // small (eval sets), corpus ids must stay below the offset
    val off = 1000000000000L
    val cb = bandedKeys(corpus, bands, rowsPerBand)
    val bb = bandedKeys(benchmark, bands, rowsPerBand)
      .select(col("doc_id").as("bench_id"), col("band"), col("bh"))
    val cand = cb.join(broadcast(bb), Seq("band", "bh"))
      .select(col("doc_id").as("da"),
        (col("bench_id") + lit(off)).as("db"))
      .distinct()
    val union = corpus.select(col("doc_id"), col("text"))
      .unionByName(benchmark.select(
        (col("doc_id") + lit(off)).as("doc_id"), col("text")))
    pairJaccard(union, cand)
      .filter(col("j") >= threshold)
      .select(col("da").as("doc_id"), (col("db") - lit(off)).as("bench_id"),
        col("j"))
  }

  /** EXACT cross-set Jaccard — the ground truth [[decontaminateFuzzy]] is
    * checked against: every (corpus, bench) pair sharing >= 1 shingle
    * (a pair with j > 0 necessarily does, so this candidate set is
    * complete) with its exact word-3-gram Jaccard. Candidate generation
    * broadcasts the benchmark shingles, so even the exact form never
    * shuffles the corpus — but unlike the banded variant every shared
    * boilerplate shingle generates a candidate, which is why the LSH form
    * is the scale path. */
  def crossPairJaccard(corpus: DataFrame, benchmark: DataFrame): DataFrame = {
    val off = 1000000000000L
    val cand = explodedShingles(corpus)
      .join(broadcast(explodedShingles(benchmark)
        .select((col("doc_id") + lit(off)).as("db"), col("shingle"))),
        "shingle")
      .select(col("doc_id").as("da"), col("db"))
      .distinct()
    val union = corpus.select(col("doc_id"), col("text"))
      .unionByName(benchmark.select(
        (col("doc_id") + lit(off)).as("doc_id"), col("text")))
    pairJaccard(union, cand)
      .select(col("da").as("doc_id"), (col("db") - lit(off)).as("bench_id"),
        col("j"))
  }

  // ------------------------------------------------------------------
  // §2.3 #39 SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash per doc: per bit, majority vote of token-hash bits.
    * Tokens are exploded and hashed once; the 64 bit-votes are 64 parallel
    * `sum` aggregates (map-side combined), then the bits are assembled with
    * constant shifts — no nested array lambdas, small codegen. */
  def simhashDocs(docs: DataFrame): DataFrame =
    // ONE fused map pass (functions.SimHash64) — the composed form below
    // explodes the token stream and pushes a 64-column vote aggregate
    // through an exchange; fused, every simhash derivation (pair faces,
    // persisted index build, incremental delta probe) is an
    // exchange-free projection. Bit-identity spec-pinned + fuzzed.
    // NULL text is out-of-domain and DROPPED: the expression's
    // UnaryExpression null-propagation would emit a (doc_id, NULL)
    // signature row, while the composed form (and the token-explode
    // oracle) lose the doc at explode(split(NULL)) — the filter keeps
    // the two forms row-identical on every input (r15 review).
    docs.filter(col("text").isNotNull).select(col("doc_id"),
      graft.functions.GraftFunctions.simhash64(col("text")).as("sh"))

  /** The composed-operator form of [[simhashDocs]] — retained as the
    * executable spec the fused expression is pinned bit-identical to
    * (the winnowComposed posture). */
  private[graft] def simhashDocsComposed(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " +")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b"))
    toks.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)): Column)
          .reduce(_.bitwiseOR(_)).as("sh"))
  }

  /** SimHash near-dup with Manku-style multi-table block pigeonholing.
    *
    * The 64-bit simhash is split into `nBlocks` near-equal blocks; a pair
    * at hamming distance <= maxHamming has its differing bits in at most
    * maxHamming blocks, so at least m = nBlocks - maxHamming blocks are
    * identical. One table per m-block combination (C(nBlocks, m) tables),
    * keyed by the combination's block values, therefore catches every such
    * pair; exact hamming on candidates filters false positives.
    *
    * The bucket-space scale lever: nBlocks=4, maxHamming=3 keys tables on
    * a single 16-bit block — 4 × 65,536 buckets, quadratic within buckets
    * at billions of docs. nBlocks=6 keys on 3-block (32-bit) combinations:
    * 20 tables × 2^32 buckets — the within-bucket population collapses and
    * the explode factor (20 rows/doc) is the price. The candidate sets
    * differ across nBlocks but the verified result set is identical (the
    * spec proves it). Table keys are xxhash64 over the block values: hash
    * collisions can only ADD candidates (removed by the exact-hamming
    * verify), never lose a pair. */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3,
      nBlocks: Int = 4, maxBucketDf: Long = 1000L): DataFrame =
    pigeonholePairs(simhashDocs(docs), maxHamming, nBlocks, maxBucketDf)

  /** Verified near-dup pairs from an arbitrary 64-bit signature frame
    * (doc_id, sh) — the Manku multi-table block join with exact
    * bit_count(xor) verification, shared by text SimHash and perceptual
    * image hashes (any 64-bit locality signature rides the same plan). */
  def pigeonholePairs(sigs: DataFrame, maxHamming: Int,
      nBlocks: Int, maxBucketDf: Long = 1000L): DataFrame = {
    // same adversarial-duplication guardrail as [[minhashLsh]]: identical
    // signatures share every pigeonhole key, so an all-duplicates corpus
    // is n² without a table-key cap; mega-keys belong to exact dedup
    val keyed0 = pigeonholeKeys(sigs, maxHamming, nBlocks)
    val keyed =
      if (maxBucketDf <= 0) keyed0
      else keyed0
        .withColumn("__df",
          count(lit(1)).over(Window.partitionBy(col("tbl"), col("key"))))
        .filter(col("__df") <= maxBucketDf)
        .drop("__df")
    keyed.select(col("doc_id").as("da"), col("sh").as("sha"), col("tbl"), col("key"))
      .join(keyed.select(col("doc_id").as("db"), col("sh").as("shb"), col("tbl"), col("key")),
        Seq("tbl", "key"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        bit_count(col("sha").bitwiseXOR(col("shb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Per-doc pigeonhole rows (doc_id, sh, tbl, key) from the text SimHash
    * signature. Shared by the batch pair join and the persisted index, so
    * the key derivation can never desynchronize between them. */
  private def simhashKeys(docs: DataFrame, maxHamming: Int,
      nBlocks: Int): DataFrame =
    pigeonholeKeys(simhashDocs(docs), maxHamming, nBlocks)

  /** Pigeonhole rows from an arbitrary (doc_id, sh) 64-bit signature
    * frame: the signature's 64 bits split into near-equal blocks, every
    * (nBlocks − maxHamming)-block combination hashed to a table key. */
  def pigeonholeKeys(sh: DataFrame, maxHamming: Int,
      nBlocks: Int): DataFrame = {
    require(nBlocks > maxHamming && nBlocks <= 16,
      s"need maxHamming < nBlocks <= 16 for the pigeonhole guarantee, " +
        s"got maxHamming=$maxHamming nBlocks=$nBlocks")
    val m = nBlocks - maxHamming
    // near-equal block widths covering all 64 bits
    val widths = Array.tabulate(nBlocks)(j => 64 / nBlocks + (if (j < 64 % nBlocks) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    val blockCols = (0 until nBlocks).map { j =>
      call_function("shiftright", col("sh"), lit(starts(j)))
        .bitwiseAND((1L << widths(j)) - 1L).as(s"__b$j")
    }
    val withBlocks = sh.select(col("doc_id") +: col("sh") +: blockCols: _*)
    val combos = (0 until nBlocks).combinations(m).toSeq
    withBlocks.select(col("doc_id"), col("sh"),
      explode(array(combos.zipWithIndex.map { case (combo, ci) =>
        struct(lit(ci).as("tbl"),
          xxhash64(combo.map(j => col(s"__b$j")): _*).as("key"))
      }: _*)).as("tk"))
      .select(col("doc_id"), col("sh"), col("tk.tbl").as("tbl"),
        col("tk.key").as("key"))
  }

  /** Persist the SimHash pigeonhole index — the fourth member of the
    * persisted near-dup family (exact digests, MinHash bands, text
    * postings, now simhash combination keys): one row per (doc_id, tbl,
    * key) with the full 64-bit signature riding along, bucketed by
    * (tbl, key) so delta probes join pre-partitioned. Row count is
    * C(nBlocks, nBlocks − maxHamming) per doc (56 at the 8/5 defaults);
    * rows are 4 longs. */
  def writeSimhashIndex(corpus: DataFrame, table: String, path: String,
      maxHamming: Int = 5, nBlocks: Int = 8, buckets: Int = 8): Unit =
    simhashKeys(corpus, maxHamming, nBlocks)
      .write.bucketBy(buckets, "tbl", "key").sortBy("tbl", "key")
      .option("path", path).mode("overwrite").saveAsTable(table)

  /** Incremental near-dup admission against the persisted simhash index —
    * [[minhashIncremental]]'s posture with one important difference: the
    * verification is EXACT, not an estimator. The full signature rides in
    * every index row, so a pigeonhole collision checks
    * bit_count(sh XOR index_sh) <= maxHamming — by the pigeonhole
    * guarantee every true <= maxHamming pair collides in some table, so
    * rejection recall vs the simhash criterion is 1.0 by construction
    * (what remains probabilistic is simhash's own fidelity to text
    * similarity, certified by the check face). Intra-delta near-dups
    * resolve min-id-wins, the family's survivor convention. Returns
    * admitted keyed rows, append-ready in the index's own bucketing. */
  def simhashIncremental(spark: org.apache.spark.sql.SparkSession,
      table: String, delta: DataFrame, maxHamming: Int = 5,
      nBlocks: Int = 8): DataFrame = {
    // dk repeats across branches; exchange reuse computes the keyed
    // subtree once (same argument as minhashIncremental — don't
    // localCheckpoint, it erases partitioning and adds exchanges).
    val dk = simhashKeys(delta, maxHamming, nBlocks)
    val idx = spark.table(table)
    val flagged = dk
      .join(idx.select(col("tbl"), col("key"), col("sh").as("ish")),
        Seq("tbl", "key"))
      .filter(bit_count(col("sh").bitwiseXOR(col("ish"))) <= maxHamming)
      .select(col("doc_id")).distinct()
    val survivors = dk.join(flagged, Seq("doc_id"), "left_anti")
    val intraRejected = survivors
      .select(col("doc_id").as("da"), col("tbl"), col("key"),
        col("sh").as("sha"))
      .join(survivors.select(col("doc_id").as("db"), col("tbl"), col("key"),
        col("sh").as("shb")), Seq("tbl", "key"))
      .filter(col("da") > col("db") &&
        bit_count(col("sha").bitwiseXOR(col("shb"))) <= maxHamming)
      .select(col("da").as("doc_id")).distinct()
    survivors.join(intraRejected, Seq("doc_id"), "left_anti")
  }

  // ------------------------------------------------------------------
  // §2.3 #40 embedding cosine near-dup
  // ------------------------------------------------------------------

  /** Cosine similarity of two double-array columns — native codegen
    * expression (one fused loop; higher-order-function composition would
    * drop out of whole-stage codegen on the ANN hot path). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_sim(a, b)

  /** Fail fast when `dim` doesn't match the data: a wrong dim null-pads
    * the plane dot products, every bit collapses to 0, and ALL vectors
    * land in bucket 0 — turning the bucketed join into the full n² blowup
    * it exists to prevent. One cheap first() probe guards against that. */
  private[operators] def validateDim(emb: DataFrame, dim: Int): Unit = {
    val actual = emb.select(size(col("embedding"))).first().getInt(0)
    require(actual == dim,
      s"embedding dimension is $actual but dim=$dim was requested — " +
        "hyperplane buckets would all collapse to 0")
  }

  /** Random-hyperplane bucket signature (`nBits` sign bits) of a `dim`-dim
    * vector column. `table` selects an independent plane family, so t
    * tables give t independent signatures of the same vector (banded
    * multi-table LSH — the same recall trick as minhash bands). table=0
    * reproduces the single-table planes.
    *
    * Backed by the fused codegen expression
    * [[graft.functions.HyperplaneSig]] — the earlier composed form (one
    * `aggregate(zip_with(...))` per bit) was bit-identical but evaluated
    * interpreted, and the signature is the map-side hot loop of every LSH
    * query. `dim` is validated upstream ([[validateDim]]); the expression
    * itself reads the vector's actual length. */
  def hyperplaneBucket(vec: Column, nBits: Int, dim: Int, table: Int = 0): Column =
    graft.functions.GraftFunctions.hyperplane_sig(vec, nBits, table)

  /** Bucket width that keeps expected occupancy near `targetOccupancy`
    * as the corpus grows: nBits = ceil(log2(n / target)), clamped to
    * [4, 24]. This is THE scale lever for hyperplane LSH — fixed nBits
    * leaves O(n²/2^nBits) residual pair generation, which a 100× corpus
    * growth turns into the all-pairs blowup the buckets exist to prevent.
    * Recall lost to narrower buckets is bought back with `nTables`
    * independent plane families (candidate if bucket-equal in ANY table),
    * exactly like minhash banding. */
  def nBitsFor(n: Long, targetOccupancy: Long = 1024L): Int = {
    val raw = math.ceil(
      math.log(math.max(n.toDouble / targetOccupancy, 1.0)) / math.log(2.0)).toInt
    math.max(4, math.min(24, raw))
  }

  /** (vec_id, table, bucket) rows: `nTables` independent hyperplane
    * signatures per vector, computed in ONE map-side projection (the
    * signatures are bound to the exploded struct array, so each plane dot
    * is evaluated once per row, not once per downstream reference). */
  private[operators] def multiTableBuckets(
      v: DataFrame, nBits: Int, dim: Int, nTables: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val kept = col("vec_id") +: carry.map(col)
    v.select(kept :+ explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"),
          hyperplaneBucket(col("v"), nBits, dim, t).as("bucket"))): _*)).as("tb"): _*)
      .select(kept ++ Seq(col("tb.t").as("t"), col("tb.bucket").as("bucket")): _*)
  }

  /** Incremental exact dedup: admit only `delta` rows whose content digest
    * is absent from `corpus` AND first (min doc_id) within the delta —
    * the daily-increment posture of a crawl pipeline, where re-running
    * exact dedup over corpus+delta from scratch would reshuffle 100 TB to
    * admit a few GB.
    *
    * Scale shape: the corpus contributes ONLY its digest column — the
    * anti-join shuffles 16-byte digests, never documents; the intra-delta
    * first-wins rule is one map-side-combinable aggregate over the
    * (small) delta. At steady state the corpus digest projection is the
    * pipeline's persistent "seen" index (write it bucketed by `h` once
    * and the per-increment shuffle disappears too). Returns the admitted
    * (doc_id, h) pairs. */
  def incremental(corpus: DataFrame, delta: DataFrame): DataFrame = {
    val seen = corpus.select(unhex(md5(col("text"))).as("h"))
    delta.select(unhex(md5(col("text"))).as("h"), col("doc_id"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .join(seen, Seq("h"), "left_anti")
      .select(col("doc_id"), col("h"))
  }

  /** Persist the corpus's digest index BUCKETED by digest — the
    * steady-state "seen" set of the incremental-dedup pipeline
    * ([[incremental]]'s doc promises this removes even the digest shuffle;
    * this is that index). One distinct-shuffle at build time; every daily
    * increment after that reads the index pre-partitioned.
    *
    * Each row also carries the (h1, h2) xxhash64 pair of the same content —
    * the STREAMING dedup's state key ([[graft.streaming.EventStreams
    * .dedupStream]]) — so one persisted seen-set serves both postures: the
    * batch increment anti-joins on `h`, and a restarted stream bootstraps
    * its state from (h1, h2) ([[graft.streaming.EventStreams
    * .dedupStreamIndexed]]). 16 extra bytes per row buys a crawl pipeline
    * whose batch corpus and live stream share one dedup horizon.
    *
    * `table` must be a saveAsTable-able identifier; `path` pins the data
    * location (bucketing metadata lives in the session catalog). */
  def writeSeenIndex(corpus: DataFrame, table: String, path: String,
      buckets: Int = 8): Unit =
    corpus.select(unhex(md5(col("text"))).as("h"),
        xxhash64(col("text")).as("h1"),
        xxhash64(lit(1), col("text")).as("h2"))
      .distinct()
      .write.bucketBy(buckets, "h").sortBy("h")
      .option("path", path).mode("overwrite").saveAsTable(table)

  /** [[incremental]] against a persisted bucketed index: the anti-join
    * reads the corpus side pre-partitioned on `h` (NO exchange — the
    * bucketed scan IS the join layout, spec-asserted), so a daily
    * increment's cost is one shuffle of the (small) delta's digests and
    * zero movement of corpus state. The output carries the full index row
    * (h, h1, h2 — all three are functions of the same content, computed in
    * the delta's one projection) so admitted digests append back into the
    * index (same bucketing) to close the loop for BOTH dedup postures. */
  def incrementalIndexed(spark: org.apache.spark.sql.SparkSession,
      table: String, delta: DataFrame): DataFrame = {
    val seen = spark.table(table)
    delta.select(unhex(md5(col("text"))).as("h"),
        xxhash64(col("text")).as("h1"),
        xxhash64(lit(1), col("text")).as("h2"),
        col("doc_id"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"),
        min(col("h1")).as("h1"), min(col("h2")).as("h2"))
      .join(seen.select(col("h")), Seq("h"), "left_anti")
      .select(col("doc_id"), col("h"), col("h1"), col("h2"))
  }

  /** Right-to-be-forgotten on the persisted seen-index — the DELETE dual
    * of [[incrementalIndexed]]'s append: removing a document's digest is
    * only correct if NO SURVIVING document produces the same digest
    * (shared content must stay indexed, or the next crawl re-admits a
    * duplicate of text the corpus still contains). The index stores no
    * doc attribution (by design — it's digest-distinct), so one
    * digest-projection pass over the survivors is provably necessary; the
    * pass reduces by a semi-join to the FORGOTTEN digest keys before
    * anything shuffles, so exchange volume is delta-sized: forgotten
    * digests + their survivor hits, never corpus state. Returns the
    * updated index (same schema, ready to persist back). */
  def forgetDigests(spark: org.apache.spark.sql.SparkSession, table: String,
      forgotten: DataFrame, survivors: DataFrame): DataFrame = {
    val fd = forgotten.select(unhex(md5(col("text"))).as("h")).distinct()
    val stillLive = survivors.select(unhex(md5(col("text"))).as("h"))
      .join(fd, Seq("h"), "left_semi").distinct()
    val removable = fd.join(stillLive, Seq("h"), "left_anti")
    spark.table(table).join(removable, Seq("h"), "left_anti")
  }

  /** Persist the corpus's MinHash BAND index — [[writeSeenIndex]]'s
    * steady-state posture applied to NEAR-dup detection (the r9 VERDICT's
    * #2). Rows are the same (band, bh) keys [[minhashLsh]] computes, each
    * carrying the doc's full minhash signature, BUCKETED + sorted on the
    * candidate-join key (band, bh): a daily delta's candidate join reads
    * the index pre-partitioned, so only the delta ever shuffles — the
    * standing corpus's text, shingles and signatures never move again. */
  def writeBandIndex(corpus: DataFrame, table: String, path: String,
      bands: Int = 8, rowsPerBand: Int = 4, buckets: Int = 8): Unit =
    bandedKeysSig(corpus, bands, rowsPerBand)
      .write.bucketBy(buckets, "band", "bh").sortBy("band", "bh")
      .option("path", path).mode("overwrite").saveAsTable(table)

  /** RIGHT-TO-BE-FORGOTTEN for the band index — the near-dup leg of the
    * purge family ([[forgetDigests]] exact /
    * [[graft.operators.TextOps.forgetTextIndex]] retrieval /
    * [[graft.operators.Similarity.forgetIvfIndex]] ANN): drop the
    * forgotten docs' band rows with ONE bucketed anti-join. Like the IVF
    * case there is no global statistic to fix — a band row carries only
    * its own (band, bucket-hash, signature) — so the purge is exactly
    * row removal, and a subsequent [[minhashIncremental]] probe can no
    * longer match the forgotten content: re-submitting it ADMITS it
    * again, which is the contract (forgotten means forgotten). */
  def forgetBandIndex(spark: org.apache.spark.sql.SparkSession,
      oldTable: String, dropIds: DataFrame, newTable: String,
      path: String, buckets: Int = 8): Unit =
    spark.table(oldTable)
      .join(dropIds.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .write.bucketBy(buckets, "band", "bh").sortBy("band", "bh")
      .option("path", path).mode("overwrite").saveAsTable(newTable)

  /** Incremental NEAR-dup admission against a persisted band index — the
    * [[incrementalIndexed]] posture for fuzzy duplicates: a delta doc is
    * REJECTED when any index collision's signature agreement estimates
    * Jaccard >= `threshold` (matches >= ceil(threshold·k), compared in
    * integers), and ADMITTED rows come back as full band-index rows
    * (doc_id, band, bh, sig) ready to append in the same bucketing — the
    * loop that makes re-running the same delta admit nothing.
    *
    * Verification is SIGNATURE-based, not exact-Jaccard: at 100 TB the
    * corpus text is exactly what must not be re-read per delta, and the
    * estimator's error (±sqrt(j(1-j)/k) ≈ 0.09 at k=32) sits in the band
    * the LSH candidate step already blurs; exact re-verification remains
    * [[minhashLsh]]'s batch job. Recall vs the exact cross-set truth is
    * certified per round by the dd_minhash_incremental_check face.
    *
    * INTRA-delta near-dups are resolved too (the [[incrementalIndexed]]
    * groupBy-h analogue for the fuzzy case): among index-survivors, a doc
    * whose band bucket holds a SMALLER-id survivor with estimated
    * Jaccard >= threshold is rejected — min-id-wins, the same survivor
    * convention the exact family uses (greedy per pair: near-dup is not
    * transitive, so a chain keeps its pairwise-distinct representatives).
    * Without this, two new near-dup docs arriving in one delta would both
    * be admitted and the append-back loop would index both forever, where
    * the batch [[minhashLsh]] over the same corpus collapses them.
    *
    * Plan shape (spec-pinned with broadcast/AQE off): every exchange is
    * DELTA-sized — the signature aggregate (computed once, reused across
    * the probe, the intra-delta self-join and the admission side), the
    * band-key partitionings, and the flagged-id distincts — and ZERO
    * exchanges above the index scan. */
  def minhashIncremental(spark: org.apache.spark.sql.SparkSession,
      table: String, delta: DataFrame, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.6): DataFrame = {
    val k = bands * rowsPerBand
    val needed = math.ceil(threshold * k).toInt
    def estMatches(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sigAgreement(a, b)
    // dk feeds the index join, the survivor anti-join and both sides of
    // the intra-delta self-join — but do NOT materialize it: the banded
    // keys end in a hash-partitioned aggregate, and Catalyst's exchange
    // reuse already computes that subtree once (a localCheckpoint erases
    // the partitioning and costs 4 extra exchanges — spec-pinned at 5).
    val dk = bandedKeysSig(delta, bands, rowsPerBand)
    val idx = spark.table(table)
    val flagged = dk
      .join(idx.select(col("band"), col("bh"), col("sig").as("isig")),
        Seq("band", "bh"))
      .filter(estMatches(col("sig"), col("isig")) >= needed)
      .select(col("doc_id")).distinct()
    val survivors = dk.join(flagged, Seq("doc_id"), "left_anti")
    val intraRejected = survivors
      .select(col("doc_id").as("da"), col("band"), col("bh"),
        col("sig").as("siga"))
      .join(survivors.select(col("doc_id").as("db"), col("band"), col("bh"),
        col("sig").as("sigb")), Seq("band", "bh"))
      .filter(col("da") > col("db") &&
        estMatches(col("siga"), col("sigb")) >= needed)
      .select(col("da").as("doc_id")).distinct()
    survivors.join(intraRejected, Seq("doc_id"), "left_anti")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means-bucket the embedding space, compare pairs ONLY within a
    * cluster, group the over-threshold pairs, keep the min vec_id per
    * group. Complements [[embedNearDup]]: hyperplane LSH buckets by random
    * projections (recall from multiple tables), SemDeDup buckets by the
    * DATA's own density structure (recall from cluster coherence) — the
    * published choice for web-scale corpora like LAION.
    *
    * Scale shape, stage by stage:
    *  - centroids train DISTRIBUTED on a hash-selected sample that scales
    *    with nCentroids ([[Similarity.trainCentroids]] — one corpus scan,
    *    then one Spark job per Lloyd's iteration over the cached sample;
    *    the driver holds only k × dim centroid doubles, so the paper's 50k
    *    clusters are reachable);
    *  - assignment is a map-only pass against broadcast centroid literals;
    *  - candidate generation is an equi-join on cluster id — never
    *    all-pairs. THE 100 TB lever is `nCentroids ∝ n` (the paper runs
    *    50k clusters): per-cluster occupancy, and with it the
    *    within-cluster O(size²) cosine work, stays constant as the corpus
    *    grows;
    *  - grouping needs NO iterative connected-components pass: dup groups
    *    cannot span clusters by construction, so one shuffle on cluster id
    *    + a per-cluster union-find (mapGroups) labels every group exactly.
    *
    * Returns (vec_id, survivor_id, keep) for every corpus vector —
    * vectors in no near-dup pair survive as their own group. Deterministic
    * given the corpus (sample order is hash-fixed, Lloyd's has no RNG),
    * but float k-means has no DuckDB twin → rows-only + semantic spec. */
  def semDedup(emb: DataFrame, tau: Double = 0.95, nCentroids: Int = 16,
      dim: Int = 64): DataFrame = {
    validateDim(emb, dim)
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = Similarity.trainCentroids(emb, nCentroids)
    val cLit = typedLit(centroids.map(_.toSeq).toSeq)
    val v = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val assigned = Similarity.withCid(v, "v", cLit)
    // zero-norm vectors (cid -1, cosine undefined) can't be near-dups of
    // anything — exclude them from pair generation instead of pooling them
    // into one pseudo-cluster whose O(size²) join defeats the occupancy
    // bound; the final left join still emits them as their own survivors
    val clustered = assigned.filter(col("cid") >= 0)
    val pairs = clustered.select(col("cid"), col("vec_id").as("va"), col("v").as("a"))
      .join(clustered.select(col("cid"), col("vec_id").as("vb"), col("v").as("b")),
        Seq("cid"))
      .filter(col("va") < col("vb"))
      .filter(cosine(col("a"), col("b")) >= tau)
      .select(col("cid"), col("va"), col("vb"))
    // exact per-cluster grouping in ONE shuffle: union-find over each
    // cluster's pairs (pair count bounded by occupancy², the lever above)
    val groups = pairs.as[(Int, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val parent = new java.util.HashMap[java.lang.Long, java.lang.Long]()
        def root(x0: Long): Long = {
          var x = x0
          var p = parent.get(x).longValue
          while (p != x) {
            val g = parent.get(p).longValue
            parent.put(x, g)
            x = g
            p = parent.get(x).longValue
          }
          x
        }
        it.foreach { case (_, a, b) =>
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val ra = root(a); val rb = root(b)
          if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
        }
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
        val ks = parent.keySet.iterator()
        while (ks.hasNext) { val k = ks.next().longValue; out += ((k, root(k))) }
        out.iterator
      }
      .toDF("vec_id", "survivor_id")
    assigned.select(col("vec_id"))
      .join(groups, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("survivor_id"), col("vec_id")).as("survivor_id"))
      .withColumn("keep", col("vec_id") === col("survivor_id"))
  }

  /** Embedding near-dup: bucket by `nTables` banded hyperplane signatures,
    * exact cosine on bucket-mates only. Vectors sharing no bucket in any
    * table are never compared — the corpus is shuffled on an (int, long)
    * key, not crossed.
    *
    * `nBits <= 0` (the default) derives the bucket width from the corpus
    * count via [[nBitsFor]], so occupancy — and with it the residual
    * within-bucket O(occupancy²) pair work — stays constant as the corpus
    * grows. Pass `n` (the corpus row count) when the caller already knows
    * it — otherwise a count() job runs here, and for a filtered/computed
    * input that job re-executes the whole upstream plan. Pass an explicit
    * nBits to skip the derivation entirely. */
  def embedNearDup(emb: DataFrame, threshold: Double = 0.95, nBits: Int = 0,
      dim: Int = 64, nTables: Int = 4, n: Long = -1L): DataFrame = {
    validateDim(emb, dim)
    val bits = if (nBits > 0) nBits else nBitsFor(if (n > 0) n else emb.count())
    val v = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    // Vectors ride THROUGH the bucket self-join (multiTableBuckets'
    // carry) and the fused cosine verifies INSIDE it, before any
    // dedup — r15 replan of the candidates-distinct-then-two-back-joins
    // shape, whose sf1 cost was the candidate-pair distinct exchange
    // plus two pair×vector join stages. Here the only pair-sized
    // exchange is the final distinct over SURVIVORS (near-dups — tiny
    // by construction); the price is the fixed-width vector payload
    // (dim doubles) replicated ×nTables through the one bucket shuffle,
    // and up to ×nTables redundant cosine evals on pairs sharing
    // several buckets — a few hundred fused-codegen flops each, far
    // cheaper than exchanging the full candidate set. Identical output:
    // same pair set, same deterministic cosine. Measured 22.6 → ~7 s on
    // the sf1 checkpoint.
    val bucketed =
      multiTableBuckets(v, bits, dim, nTables, carry = Seq("v"))
    bucketed
      .select(col("vec_id").as("va"), col("v").as("a"),
        col("t"), col("bucket"))
      .join(bucketed.select(col("vec_id").as("vb"), col("v").as("b"),
        col("t"), col("bucket")), Seq("t", "bucket"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"), cosine(col("a"), col("b")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  // ------------------------------------------------------------------
  // exact substring dedup (stride-window ExactSubstr)
  // ------------------------------------------------------------------

  /** Per-document duplicated-span accounting, the practical Spark
    * re-expression of exact substring dedup (Lee et al. 2022's ExactSubstr,
    * which suffix-arrays the whole corpus on one machine — not a 100 TB
    * posture). Every document is cut into fixed `w`-char windows every
    * `stride` chars; a window whose content occurs >= 2 times ANYWHERE in
    * the corpus (other docs or a repeat within the same doc) is a
    * duplicated span witness. Reported per doc: window count, duplicated
    * window count, their exact fraction, and a flag at >= 20% (compared in
    * integers so no float threshold edge can flip cross-engine).
    *
    * Scale shape: the window stream leaves the scan as (doc_id,
    * xxhash64(window)) — 16 bytes/row, ~`1/stride` of corpus chars. The
    * corpus-wide occurrence count then joins back from a
    * map-side-combined groupBy(h) whose output is ALREADY partitioned on
    * h (the join adds only the stream-side exchange), and one
    * map-side-combinable groupBy(doc_id) folds the flags. No O(n²) pair
    * space, nothing driver-side. `useWindow = true` switches to a
    * count-over-hash-partition window — ONE exchange of the stream and
    * measured ~20% faster at test SF — but WindowExec buffers each h
    * group whole, so a boilerplate window duplicated a billion times
    * lands one giant spilling group on one task; the join form feeds the
    * hot h through AQE's skew-split instead, which is why it is the
    * 100 TB default.
    *
    * The stride is the fidelity/volume lever: duplicated spans are
    * detected when their window offsets align mod `stride`, so identical
    * prefixes/suffixes of >= w+stride chars always witness, while a span
    * duplicated at an unaligned offset needs stride=1 (full rolling-hash
    * fidelity, `stride`x the shuffle — the 100 TB default stays 10). */
  def substrDup(docs: DataFrame, w: Int = 40, stride: Int = 10,
      useWindow: Boolean = false): DataFrame = {
    // Fused window hashing (functions.StrideWinHashes): the composed
    // transform(substring)+xxhash64 form re-seeks each window's char
    // boundary from the string start — O(len²/stride) per doc; the fused
    // expression builds the boundary index once and hashes byte ranges in
    // place (bit-identical XXH64 seed-42 output, spec-pinned).
    val wins = docs
      .filter(length(col("text")) >= w)
      .select(col("doc_id"), explode(
        graft.functions.GraftFunctions.stride_win_hashes(
          col("text"), w, stride)).as("h"))
    val counted =
      if (useWindow)
        wins.withColumn("c", count(lit(1)).over(Window.partitionBy(col("h"))))
      else {
        // cnt's aggregate output is already hash-partitioned on h, so the
        // join adds only the wins-side exchange
        val cnt = wins.groupBy(col("h")).agg(count(lit(1)).as("c"))
        wins.join(cnt, Seq("h"))
      }
    val per = counted.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_dup"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac",
        when(col("n_windows") === 0L, 0.0)
          .otherwise(col("n_dup").cast("double") / col("n_windows").cast("double")))
      .withColumn("flagged", col("n_windows") > 0L && col("n_dup") * 5L >= col("n_windows"))
  }

  /** Persisted WINDOW-HASH COUNT index for substring dedup — the sixth
    * member of the persisted-index family (exact digests, MinHash bands,
    * SimHash keys, text postings, cluster map): (h, c) occurrence counts
    * over the standing corpus's stride windows, bucketed by h so delta
    * probes join pre-partitioned. Counts are ADDITIVE (the incr_agg
    * posture), so a delta merges without touching historical text. */
  def writeSubstrIndex(corpus: DataFrame, table: String, path: String,
      w: Int = 40, stride: Int = 10, buckets: Int = 8): Unit =
    corpus.filter(length(col("text")) >= w)
      .select(explode(graft.functions.GraftFunctions.stride_win_hashes(
        col("text"), w, stride)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
      .write.bucketBy(buckets, "h").sortBy("h")
      .option("path", path).mode("overwrite").saveAsTable(table)

  /** INCREMENTAL substring dedup: per-DELTA-doc duplicated-span
    * accounting where a window is duplicated iff its CORPUS-WIDE count
    * (standing index + the delta's own contributions) is ≥ 2 — exactly
    * what a from-scratch [[substrDup]] over (standing ∪ delta) reports
    * for the delta docs, which is what the face's oracle recomputes.
    * Cost is delta-sided: the delta's windows hash and aggregate once,
    * the index contributes ONE bucketed probe of the delta's hash set,
    * and historical TEXT is never re-read. */
  def substrIncremental(spark: org.apache.spark.sql.SparkSession,
      table: String, delta: DataFrame, w: Int = 40,
      stride: Int = 10): DataFrame = {
    val wins = delta
      .filter(length(col("text")) >= w)
      .select(col("doc_id"), explode(
        graft.functions.GraftFunctions.stride_win_hashes(
          col("text"), w, stride)).as("h"))
    val deltaCnt = wins.groupBy(col("h")).agg(count(lit(1)).as("dc"))
    val merged = deltaCnt
      .join(spark.table(table), Seq("h"), "left")
      .select(col("h"), (col("dc") + coalesce(col("c"), lit(0L))).as("c"))
    val per = wins.join(merged, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_dup"))
    delta.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac",
        when(col("n_windows") === 0L, 0.0)
          .otherwise(col("n_dup").cast("double") / col("n_windows").cast("double")))
      .withColumn("flagged",
        col("n_windows") > 0L && col("n_dup") * 5L >= col("n_windows"))
  }

  /** Edit-distance VERIFICATION of candidate pairs — the classic second
    * stage of a candidate-generate → verify dedup pipeline (Jaccard is
    * set-based and order-blind; Levenshtein catches reorderings and
    * rewrites it conflates). Each candidate pair scores the exact edit
    * distance between the documents' normalized prefixes
    * (lowercased, [a-z0-9 ] only — byte = char on both engines — first
    * `prefixLen` chars: the distance is Θ(prefixLen²) per pair, so the
    * prefix bound is what makes the verify affordable; pairs whose prefix
    * distance exceeds `maxDist` are dropped.
    *
    * Candidates are pluggable: the oracle face feeds the exact shared-
    * shingle pairs (cross-engine-neutral), a 100 TB pipeline feeds
    * [[minhashLsh]]/[[simhashPairs]] output — the verify code is the same
    * candidate-sized join either way; the corpus never crosses itself. */
  def editDistVerify(docs: DataFrame, pairs: DataFrame,
      prefixLen: Int = 80, maxDist: Int = 40): DataFrame = {
    val norm = docs.select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        1, prefixLen).as("p"))
    pairs.select(col("da"), col("db"))
      .join(norm.select(col("doc_id").as("da"), col("p").as("pa")), "da")
      .join(norm.select(col("doc_id").as("db"), col("p").as("pb")), "db")
      // SOUND pre-filter: |len(a) − len(b)| > maxDist already implies
      // dist > maxDist (each length unit needs ≥ 1 edit) — free cut
      // before the DP, no candidate it keeps can be wrong (r14 ADVICE
      // item 6's length band)
      .filter(abs(length(col("pa")) - length(col("pb"))) <= maxDist)
      // UNBOUNDED levenshtein + filter, not the 3-arg thresholded form:
      // on these short normalized prefixes (≤80 chars) the banded
      // early-abandon variant measured 2x SLOWER than the plain DP
      // (6.1 vs 3.0 s over 250k sf1 pairs — the per-call band set-up
      // dominates at this string length). Identical output either way;
      // at a larger prefixLen re-measure before switching back.
      .select(col("da"), col("db"),
        levenshtein(col("pa"), col("pb")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
