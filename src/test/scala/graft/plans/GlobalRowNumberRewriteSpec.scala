package graft.plans

import graft.SparkSpec
import graft.tools.PlanChecks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The RankedSpec treatment for [[GlobalRowNumberRewrite]] (r12 VERDICT
  * "What's wrong" #1): the rule's output is bit-identical to the stock
  * single-window plan on tie-heavy multi-partition data, the rule is a
  * fixed point, every guard (disable flag, exchange-reuse bail-out, top-k
  * rank-limit skip, nondeterministic sort keys) keeps the stock plan, and
  * an end-to-end GraftExtensions session runs a user's
  * `row_number() OVER (ORDER BY ...)` SQL through the distributed-prefix
  * plan with zero unpartitioned windows over raw rows. Also pins the
  * [[graft.operators.Ranked]] fallback under
  * `spark.sql.exchange.reuse=false` (r12 ADVICE #1).
  */
class GlobalRowNumberRewriteSpec extends SparkSpec {

  private def assertSameRows(a: DataFrame, b: DataFrame, hint: String): Unit = {
    val ra = a.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val rb = b.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(ra.length == rb.length, s"$hint: ${ra.length} vs ${rb.length} rows")
    assert(ra.sameElements(rb),
      s"$hint: first diff at ${ra.zip(rb).indexWhere(p => p._1 != p._2)}")
  }

  /** 20k rows, 7 heavy tie groups — every range boundary lands inside the
    * key space, and 4 shuffle partitions force multi-partition plans. */
  private def tieHeavy: DataFrame =
    spark.range(20000).select((col("id") % 7).as("k"),
      ((col("id") * 2654435761L) % 1000).as("v"), col("id"))

  private def guardedL(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _ if p.children.isEmpty => false
    case _ => p.children.forall(guardedL)
  }

  /** Unpartitioned logical Windows over non-aggregate-guarded input. */
  private def rawGlobalWindows(p: LogicalPlan): Int =
    p.collect {
      case w: LWindow if w.partitionSpec.isEmpty && !guardedL(w.child) => w
    }.size

  test("bit-identity vs the stock plan on a total order, " +
      "downstream references to the original attribute ids intact") {
    val df = tieHeavy
      .withColumn("rn", row_number().over(Window.orderBy(col("k"), col("id"))))
      .withColumn("d", col("rn") * 2)
    val a = df.queryExecution.optimizedPlan
    val r = GlobalRowNumberRewrite(a)
    assert(r ne a, "rule did not fire on the canonical global row_number")
    assert(rawGlobalWindows(r) == 0,
      s"rewritten plan still has a raw global window:\n$r")
    assertSameRows(ColumnBridge.ofRows(spark, r), df, "total order")
  }

  test("tie-heavy (non-total) order: per-key rank ranges match the stock " +
      "plan exactly") {
    val df = tieHeavy
      .withColumn("rn", row_number().over(Window.orderBy(col("k"))))
    val a = df.queryExecution.optimizedPlan
    val r = GlobalRowNumberRewrite(a)
    assert(r ne a)
    def perKey(d: DataFrame) = d.groupBy(col("k"))
      .agg(min(col("rn")).as("lo"), max(col("rn")).as("hi"),
        count(lit(1)).as("n"), sum(col("rn")).as("s"))
    assertSameRows(perKey(ColumnBridge.ofRows(spark, r)), perKey(df),
      "per-key rank ranges")
    // and the rank multiset is exactly 1..n
    val n = df.count()
    assert(ColumnBridge.ofRows(spark, r)
      .agg(countDistinct(col("rn")), min(col("rn")), max(col("rn")))
      .collect().head.toSeq == Seq(n, 1, n.toInt))
  }

  test("fixed point; disable flag and exchange-reuse bail-out keep the " +
      "stock plan untouched") {
    val a = tieHeavy
      .withColumn("rn", row_number().over(Window.orderBy(col("k"), col("id"))))
      .queryExecution.optimizedPlan
    val r1 = GlobalRowNumberRewrite(a)
    assert(r1 ne a)
    assert(GlobalRowNumberRewrite(r1) eq r1, "rule is not a fixed point")
    spark.conf.set(GlobalRowNumberRewrite.ConfKey, "false")
    try assert(GlobalRowNumberRewrite(a) eq a, "disable flag ignored")
    finally spark.conf.unset(GlobalRowNumberRewrite.ConfKey)
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try assert(GlobalRowNumberRewrite(a) eq a,
      "rule must bail out when exchange reuse is disabled")
    finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("small rn <= k rank-limit filters keep the stock (WindowGroupLimit-" +
      "eligible) shape; large k still rewrites") {
    val base = tieHeavy
      .withColumn("rn", row_number().over(Window.orderBy(col("k"), col("id"))))
    val small = base.filter(col("rn") <= 5).queryExecution.analyzed
    assert(GlobalRowNumberRewrite(small) eq small,
      "top-k idiom must keep the stock plan")
    val smallLt = base.filter(col("rn") < 10).queryExecution.analyzed
    assert(GlobalRowNumberRewrite(smallLt) eq smallLt)
    val eq5 = base.filter(col("rn") === 5).queryExecution.analyzed
    assert(GlobalRowNumberRewrite(eq5) eq eq5)
    val big = base.filter(col("rn") <= 100000).queryExecution.analyzed
    assert(GlobalRowNumberRewrite(big) ne big,
      "k above the threshold is not the top-k regime — rewrite")
    // the optimizer's own InferWindowGroupLimit output is guarded too
    val smallOpt = base.filter(col("rn") <= 5).queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(smallOpt) eq smallOpt)
  }

  test("running-aggregate family: sum/count/min/max over the ROWS " +
      "unbounded→current frame rewrite and stay bit-identical; RANGE " +
      "frames and avg keep the stock plan") {
    val rowsW = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = tieHeavy
      .withColumn("s", sum(col("v")).over(rowsW))
      .withColumn("c", count(lit(1)).over(rowsW))
      .withColumn("mn", min(col("v")).over(rowsW))
      .withColumn("mx", max(col("v")).over(rowsW))
      .withColumn("rn", row_number().over(Window.orderBy(col("k"), col("id"))))
    val a = df.queryExecution.optimizedPlan
    val r = GlobalRowNumberRewrite(a)
    assert(r ne a, "running-aggregate window did not rewrite")
    assert(rawGlobalWindows(r) == 0, s"raw global window left:\n$r")
    assertSameRows(ColumnBridge.ofRows(spark, r), df, "running aggregates")
    // nullable input: NULL-handling of the prefix merge (Least/Greatest
    // skip NULLs; a NULL sum prefix keeps the local value)
    val dfn = tieHeavy
      .withColumn("vn", when(col("id") % 3 === 0, col("v")))
      .withColumn("s", sum(col("vn")).over(rowsW))
      .withColumn("mn", min(col("vn")).over(rowsW))
    val an = dfn.queryExecution.optimizedPlan
    val rn2 = GlobalRowNumberRewrite(an)
    assert(rn2 ne an)
    assertSameRows(ColumnBridge.ofRows(spark, rn2), dfn, "nullable running")
    // RANGE frame (tie peers) and avg are NOT in the family
    val rangeW = Window.orderBy(col("k"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val keep1 = tieHeavy.withColumn("s", sum(col("v")).over(rangeW))
      .queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(keep1) eq keep1,
      "RANGE frames must keep the stock plan (tie peers)")
    val keep2 = tieHeavy.withColumn("m", avg(col("v")).over(rowsW))
      .queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(keep2) eq keep2, "avg is not in the family")
    // a small `s <= k` filter on a running SUM is NOT the top-k idiom —
    // the rank-limit guard must not block the rewrite
    val filtered = tieHeavy.withColumn("s", sum(col("v")).over(rowsW))
      .filter(col("s") <= 5).queryExecution.analyzed
    assert(GlobalRowNumberRewrite(filtered) ne filtered,
      "rank-limit guard wrongly applied to a running sum")
  }

  test("ntile joins the family: bit-identical buckets, including the " +
      "cnt < n edge and uneven remainders") {
    val df = tieHeavy
      .withColumn("t3", ntile(3).over(Window.orderBy(col("k"), col("id"))))
      .withColumn("t7", ntile(7).over(Window.orderBy(col("k"), col("id"))))
    val a = df.queryExecution.optimizedPlan
    val r = GlobalRowNumberRewrite(a)
    assert(r ne a, "ntile window did not rewrite")
    assert(rawGlobalWindows(r) == 0, s"raw global window left:\n$r")
    assertSameRows(ColumnBridge.ofRows(spark, r), df, "ntile buckets")
    // cnt < n: every row is its own bucket, no division by zero
    val tiny = spark.range(4).select(col("id"))
      .withColumn("t9", ntile(9).over(Window.orderBy(col("id"))))
    val at = tiny.queryExecution.optimizedPlan
    val rt = GlobalRowNumberRewrite(at)
    assert(rt ne at)
    assertSameRows(ColumnBridge.ofRows(spark, rt), tiny, "ntile cnt<n")
  }

  test("rank family: rank/dense_rank/percent_rank/cume_dist rewrite to " +
      "the distinct-key plan, bit-identical on tie-heavy data") {
    // 7 heavy tie groups over 4 partitions: every range boundary lands
    // INSIDE a tie group on the raw data — exactly the case the pid-prefix
    // machinery cannot serve and the distinct-key decomposition must
    val df = tieHeavy
      .withColumn("r", rank().over(Window.orderBy(col("k"))))
      .withColumn("dr", dense_rank().over(Window.orderBy(col("k"))))
      .withColumn("pr", percent_rank().over(Window.orderBy(col("k"))))
      .withColumn("cd", cume_dist().over(Window.orderBy(col("k"))))
    val a = df.queryExecution.optimizedPlan
    val r = GlobalRowNumberRewrite(a)
    assert(r ne a, "rank-family window did not rewrite")
    assert(rawGlobalWindows(r) == 0, s"raw global window left:\n$r")
    assert(GlobalRowNumberRewrite(r) eq r, "rank rewrite is not a fixed point")
    assertSameRows(ColumnBridge.ofRows(spark, r), df, "rank family")
    // multi-key sort with DESC + NULLS FIRST and null keys present:
    // direction, null ordering and null-peer grouping must all survive
    val dfn = tieHeavy
      .withColumn("kn", when(col("id") % 5 === 0, col("k")))
      .withColumn("r", rank().over(Window.orderBy(col("kn").desc_nulls_first,
        col("v").asc)))
      .withColumn("cd", cume_dist().over(Window.orderBy(
        col("kn").desc_nulls_first, col("v").asc)))
    val an = dfn.queryExecution.optimizedPlan
    val rn = GlobalRowNumberRewrite(an)
    assert(rn ne an, "null-keyed rank window did not rewrite")
    assertSameRows(ColumnBridge.ofRows(spark, rn), dfn, "rank desc/nulls")
    // the single-row-total edge: percent_rank of one row is 0.0, no 0/0
    val one = spark.range(1).select(col("id"))
      .withColumn("pr", percent_rank().over(Window.orderBy(col("id"))))
    val ao = one.queryExecution.optimizedPlan
    val ro = GlobalRowNumberRewrite(ao)
    assert(ro ne ao)
    assertSameRows(ColumnBridge.ofRows(spark, ro), one, "percent_rank n=1")
  }

  test("rank-family guards: rank <= k keeps the stock top-k shape, a " +
      "mixed rank+row_number window keeps the stock plan, partitioned " +
      "rank windows are untouched") {
    val base = tieHeavy
      .withColumn("r", rank().over(Window.orderBy(col("k"), col("id"))))
    val small = base.filter(col("r") <= 5).queryExecution.analyzed
    assert(GlobalRowNumberRewrite(small) eq small,
      "rank top-k idiom must keep the stock (WindowGroupLimit) plan")
    val big = base.filter(col("r") <= 100000).queryExecution.analyzed
    assert(GlobalRowNumberRewrite(big) ne big, "large k is not top-k")
    // percent_rank emits doubles — a `pr <= k` filter is NOT the idiom
    val prf = tieHeavy
      .withColumn("pr", percent_rank().over(Window.orderBy(col("k"))))
      .filter(col("pr") <= lit(1)).queryExecution.analyzed
    assert(GlobalRowNumberRewrite(prf) ne prf,
      "a percent_rank filter must not block the rewrite")
    // mixed family in ONE window spec: the two plan shapes don't compose
    val mixed = tieHeavy
      .withColumn("r", rank().over(Window.orderBy(col("k"), col("id"))))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("k"), col("id"))))
      .queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(mixed) eq mixed,
      "mixed rank+row_number window must keep the stock plan")
    val part = tieHeavy
      .withColumn("r",
        rank().over(Window.partitionBy(col("k")).orderBy(col("id"))))
      .queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(part) eq part)
  }

  test("whole-input frames: agg(x) OVER () rewrites to a broadcast scalar " +
      "aggregate — bit-identical, including share-of-total and " +
      "the empty-input edge") {
    val df = tieHeavy
      .withColumn("s", sum(col("v")).over(Window.partitionBy()))
      .withColumn("c", count(lit(1)).over(Window.partitionBy()))
      .withColumn("mn", min(col("v")).over(Window.partitionBy()))
      .withColumn("mx", max(col("v")).over(Window.partitionBy()))
      .withColumn("av", avg(col("v")).over(Window.partitionBy()))
      .withColumn("share",
        col("v") / sum(col("v")).over(Window.partitionBy()))
    val a = df.queryExecution.optimizedPlan
    val r = GlobalRowNumberRewrite(a)
    assert(r ne a, "global-agg window did not rewrite")
    assert(rawGlobalWindows(r) == 0, s"raw global window left:\n$r")
    assert(GlobalRowNumberRewrite(r) eq r, "global-agg rewrite not a fixed point")
    assertSameRows(ColumnBridge.ofRows(spark, r), df, "global aggregates")
    // the explicit ORDER BY + unbounded..unbounded spelling is the same
    // whole-input frame
    val ordered = tieHeavy.withColumn("s", sum(col("v")).over(
      Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val ao = ordered.queryExecution.optimizedPlan
    val ro = GlobalRowNumberRewrite(ao)
    assert(ro ne ao, "ordered whole-frame agg did not rewrite")
    assertSameRows(ColumnBridge.ofRows(spark, ro), ordered, "ordered whole")
    // empty input stays empty (stock window of nothing is nothing)
    val empty = tieHeavy.filter(col("id") < 0)
      .withColumn("s", sum(col("v")).over(Window.partitionBy()))
    val ae = empty.queryExecution.analyzed
    val re = GlobalRowNumberRewrite(ae)
    assert(re ne ae)
    assert(ColumnBridge.ofRows(spark, re).count() == 0)
    // order-dependent aggregates and mixed running+whole frames keep stock
    val fv = tieHeavy.withColumn("f",
      first(col("v")).over(Window.orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(fv) eq fv,
      "first_value is tie-order-dependent — must keep the stock plan")
  }

  test("the shared Ranked size gate keeps the stock plan for inputs " +
      "estimated under the threshold") {
    val a = tieHeavy
      .withColumn("rn", row_number().over(Window.orderBy(col("k"), col("id"))))
      .queryExecution.optimizedPlan
    spark.conf.set(graft.operators.Ranked.SmallBytesKey, (1L << 30).toString)
    try assert(GlobalRowNumberRewrite(a) eq a,
      "a small input must keep the stock single-task window")
    finally spark.conf.set(graft.operators.Ranked.SmallBytesKey, "0")
    assert(GlobalRowNumberRewrite(a) ne a, "gate off again: rewrite resumes")
  }

  test("nondeterministic sort keys and partitioned windows are never " +
      "rewritten") {
    val nd = tieHeavy
      .withColumn("rn", row_number().over(Window.orderBy(rand(7))))
      .queryExecution.analyzed
    assert(GlobalRowNumberRewrite(nd) eq nd)
    val part = tieHeavy
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("k")).orderBy(col("id"))))
      .queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(part) eq part)
  }

  test("nondeterministic CHILD subtrees keep the stock plan for the " +
      "two-branch rewrites (global agg + rank family)") {
    // a rand()-based sample filter below the window: rewriteGlobalAgg and
    // rewriteRank execute the child as TWO independent subtrees (no shared
    // exchange), so each branch would re-draw the sample and the
    // scalar/rank values could silently disagree with the rows they
    // annotate — the determinism guard must keep the stock plan
    val sampled = tieHeavy.filter(rand(7) < 0.5) // a genuine ND sample
    val ga = sampled
      .withColumn("s", sum(col("v")).over(Window.partitionBy()))
      .queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(ga) eq ga,
      "global-agg rewrite fired over a nondeterministic child")
    val rk = sampled
      .withColumn("r", rank().over(Window.orderBy(col("k"))))
      .queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(rk) eq rk,
      "rank rewrite fired over a nondeterministic child")
    // positive control: the same shapes over the deterministic base DO
    // rewrite — the guard gates on the child, not the whole family
    val gaOk = tieHeavy
      .withColumn("s", sum(col("v")).over(Window.partitionBy()))
      .queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(gaOk) ne gaOk,
      "deterministic positive control did not rewrite (global agg)")
    val rkOk = tieHeavy
      .withColumn("r", rank().over(Window.orderBy(col("k"))))
      .queryExecution.optimizedPlan
    assert(GlobalRowNumberRewrite(rkOk) ne rkOk,
      "deterministic positive control did not rewrite (rank)")
  }

  test("Ranked falls back to the stock single-window spelling when " +
      "exchange reuse is disabled — never a silently-wrong prefix") {
    val sort = Seq(col("k").asc, col("id").asc)
    // materialize the reference ranks BEFORE disabling reuse — the ranked
    // plan itself is only correct while ReuseExchange is on
    val want = graft.operators.Ranked
      .withGlobalRowNumber(tieHeavy, "rn", sort).select(col("id"), col("rn"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val got = graft.operators.Ranked.withGlobalRowNumber(tieHeavy, "rn", sort)
      assert(!got.queryExecution.executedPlan.toString
          .contains("rangepartitioning"),
        "fallback should not range-partition without exchange reuse")
      val gotRows = got.select(col("id"), col("rn")).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
      assert(gotRows.sameElements(want),
        s"Ranked fallback: first diff at ${gotRows.zip(want)
          .indexWhere(p => p._1 != p._2)}")
      val run = graft.operators.Ranked.withGlobalRunningSum(
        tieHeavy, "s", col("v"), sort)
      assert(!run.queryExecution.executedPlan.toString
        .contains("rangepartitioning"))
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("GraftExtensions end-to-end: a user session's SQL row_number runs " +
      "the distributed-prefix plan; the top-k idiom keeps WindowGroupLimit") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // force-init the shared session BEFORE clearing
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.graft.ranked.smallBytes", "0") // tiny test frame
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne spark, "expected a fresh session for the extensions test")
      s2.range(20000).select((col("id") % 7).as("k"), col("id"))
        .createOrReplaceTempView("graft_rnr_t")
      val q = s2.sql(
        "SELECT id, k, row_number() OVER (ORDER BY k, id) AS rn " +
          "FROM graft_rnr_t")
      q.collect()
      val plan = PlanChecks.finalPlan(q)
      assert(PlanChecks.globalWindowsOverRaw(plan) == 0,
        s"extensions session still planned a raw global window:\n$plan")
      assert(plan.toString.contains("rangepartitioning"),
        "expected the distributed-prefix range exchange")
      // rn must equal the global (k, id) position, 1-based
      val rows = q.select(col("k"), col("id"), col("rn")).collect()
        .sortBy(r => (r.getLong(0), r.getLong(1)))
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(2) == i + 1, s"row $i got rn ${r.getInt(2)}")
      }
      // top-k keeps the stock WindowGroupLimit shape under extensions too
      val topk = s2.sql(
        "SELECT * FROM (SELECT id, row_number() OVER (ORDER BY k, id) rn " +
          "FROM graft_rnr_t) WHERE rn <= 5")
      val topkPlan = topk.queryExecution.executedPlan.toString
      // unpartitioned rank-limit plans as WindowGroupLimit or collapses
      // further to TakeOrderedAndProject — either is the k-bounded regime
      assert(topkPlan.contains("WindowGroupLimit") ||
        topkPlan.contains("TakeOrderedAndProject"), topkPlan)
      assert(topk.collect().map(_.getInt(1)).sorted.sameElements(1 to 5))
      // the rank family rides the same injection: a user's global rank
      // runs the distinct-key plan (no raw global window), answers exact
      val rq = s2.sql(
        "SELECT k, rank() OVER (ORDER BY k) AS r, " +
          "cume_dist() OVER (ORDER BY k) AS cd FROM graft_rnr_t")
      rq.collect()
      val rqPlan = PlanChecks.finalPlan(rq)
      assert(PlanChecks.globalWindowsOverRaw(rqPlan) == 0,
        s"extensions session still planned a raw global rank window:\n$rqPlan")
      val perK = rq.groupBy(col("k")).agg(min(col("r")).as("r"),
        countDistinct(col("r")).as("nr"), min(col("cd")).as("cd"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(_._1)
      // 20000 rows, k = id % 7: groups 0..5 have 2858 rows, group 6 has
      // 2852; rank jumps by group size, cume_dist is the inclusive share
      var expRank = 1L
      var cum = 0L
      perK.foreach { case (k, r, nr, cd) =>
        val sz = if (k < 20000 % 7) 2858L else 2857L
        assert(r == expRank, s"k=$k rank $r != $expRank")
        assert(nr == 1L, s"k=$k: peers must share one rank")
        cum += sz
        assert(math.abs(cd - cum.toDouble / 20000.0) < 1e-15, s"k=$k cd=$cd")
        expRank += sz
      }
      // share-of-total — the most common global-window cliff — plans as
      // a broadcast scalar aggregate under the same injection
      val sq = s2.sql(
        "SELECT id, id / sum(id) OVER () AS share FROM graft_rnr_t")
      sq.collect()
      val sqPlan = PlanChecks.finalPlan(sq)
      assert(PlanChecks.globalWindowsOverRaw(sqPlan) == 0,
        s"share-of-total still planned a raw global window:\n$sqPlan")
      val tot = 19999.0 * 20000.0 / 2.0
      val shares = sq.collect()
      assert(shares.forall(r => r.getDouble(1) == r.getLong(0) / tot))
      // and graft's SQL functions rode in through the same extensions
      assert(s2.sql("SELECT nfc_normalize('abc')").collect().head
        .getString(0) == "abc")
    } finally {
      s2.catalog.dropTempView("graft_rnr_t")
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
