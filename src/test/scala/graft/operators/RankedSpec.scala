package graft.operators

import graft.{SparkSpec, Tables}
import graft.tools.PlanChecks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the r12 de-single-partition rework (r11 VERDICT #1/#2): every
  * [[Ranked]] primitive is BIT-IDENTICAL to the unpartitioned-window
  * spelling it replaces, the reworked faces return exactly the rows the
  * r11 window spellings returned, and the plans carry ZERO unpartitioned
  * Windows over corpus-proportional input (the new Audit flag). Also pins
  * the machinery's one structural invariant: the ranked branch and the
  * offsets branch read the SAME range exchange (ReuseExchange), so the
  * partition ids they see agree by construction.
  */
class RankedSpec extends SparkSpec {

  private def assertSameRows(a: DataFrame, b: DataFrame, hint: String): Unit = {
    val ra = a.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val rb = b.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(ra.length == rb.length, s"$hint: ${ra.length} vs ${rb.length} rows")
    assert(ra.sameElements(rb),
      s"$hint: first diff at ${ra.zip(rb).indexWhere(p => p._1 != p._2)}")
  }

  private lazy val li = Tables.load(spark, sf, "lineitem")
    .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))

  test("withGlobalRowNumber == unpartitioned row_number (total order)") {
    val sort = Seq(col("cents").asc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val got = Ranked.withGlobalRowNumber(li, "rn", sort)
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
    val want = li.withColumn("rn",
        row_number().over(Window.orderBy(sort: _*)).cast("long"))
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
    assertSameRows(got, want, "global row_number")
  }

  test("paddedKeys survives duplicate column names after a join (pad " +
      "columns resolve by attribute, not name)") {
    // a joined frame with TWO columns named "cents": the old name-based
    // pad (col("cents")) failed at analysis with an ambiguous reference;
    // attribute-based pads must both disambiguate and keep the
    // exchange-identity pin intact
    val a = li.select(col("l_orderkey"), col("l_linenumber"), col("cents"))
    val b = li.groupBy(col("l_orderkey").as("k"))
      .agg(max(col("cents")).as("cents"))
    val joined = a.join(b, a("l_orderkey") === b("k"))
    val sort = Seq(a("cents").asc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val got = Ranked.withGlobalRowNumber(joined, "rn", sort)
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
    val want = joined.withColumn("rn",
        row_number().over(Window.orderBy(sort: _*)).cast("long"))
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
    assertSameRows(got, want, "dup-name frame")
  }

  test("withGroupRowNumber == partitioned row_number, countOut == group n") {
    val sort = Seq(col("cents").asc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val got = Ranked.withGroupRowNumber(li, "rn", "l_returnflag", sort,
        countOut = "n")
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"), col("n"))
    val want = li
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(sort: _*))
        .cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"), col("n"))
    assertSameRows(got, want, "group row_number")
  }

  test("withGlobalRunningSum == unpartitioned running sum") {
    val sort = Seq(col("cents").asc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val got = Ranked.withGlobalRunningSum(li, "run", col("cents"), sort)
      .select(col("l_orderkey"), col("l_linenumber"), col("run"))
    val want = li.withColumn("run", sum(col("cents")).over(
        Window.orderBy(sort: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("l_orderkey"), col("l_linenumber"), col("run"))
    assertSameRows(got, want, "running sum")
  }

  test("withGlobalLag/Lead == unpartitioned lag/lead with default, " +
      "including offsets larger than a partition and null values") {
    val sort = Seq(col("cents").asc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    // null-bearing value column: the fix join must distinguish a real
    // NULL value from a missing offset row (which takes the default)
    val v = when(col("l_linenumber") =!= 3, col("cents"))
    val base = li.withColumn("vn", v)
    val w = Window.orderBy(sort: _*)
    for (n <- Seq(1, 7, 6000)) { // 6000 > rows/nPart: every row boundary
      val gotLag = Ranked.withGlobalLag(base, "x", col("vn"), n,
        lit(-1L), sort)
        .select(col("l_orderkey"), col("l_linenumber"), col("x"))
      val wantLag = base
        .withColumn("x", lag(col("vn"), n, -1L).over(w))
        .select(col("l_orderkey"), col("l_linenumber"), col("x"))
      assertSameRows(gotLag, wantLag, s"global lag($n)")
      val gotLead = Ranked.withGlobalLead(base, "x", col("vn"), n,
        lit(null).cast("long"), sort)
        .select(col("l_orderkey"), col("l_linenumber"), col("x"))
      val wantLead = base
        .withColumn("x", lead(col("vn"), n).over(w))
        .select(col("l_orderkey"), col("l_linenumber"), col("x"))
      assertSameRows(gotLead, wantLead, s"global lead($n)")
    }
    // the small gate and the reuse-off fallback agree with stock too
    spark.conf.set(Ranked.SmallBytesKey, (1L << 30).toString)
    try {
      val gotSmall = Ranked.withGlobalLag(base, "x", col("vn"), 2,
        lit(0L), sort).select(col("l_orderkey"), col("l_linenumber"), col("x"))
      assertSameRows(gotSmall, base
        .withColumn("x", lag(col("vn"), 2, 0L).over(w))
        .select(col("l_orderkey"), col("l_linenumber"), col("x")),
        "small-gate lag")
    } finally spark.conf.set(Ranked.SmallBytesKey, "0")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val gotFb = Ranked.withGlobalLead(base, "x", col("vn"), 2,
        lit(0L), sort).select(col("l_orderkey"), col("l_linenumber"), col("x"))
      assert(!gotFb.queryExecution.executedPlan.toString
        .contains("rangepartitioning"))
      assertSameRows(gotFb, base
        .withColumn("x", lead(col("vn"), 2, 0L).over(w))
        .select(col("l_orderkey"), col("l_linenumber"), col("x")),
        "reuse-off lead")
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("withStrictPrecedingMax == unpartitioned RANGE(-inf,-1) max, " +
      "ties (equal keys) excluded from their own frame") {
    val p = Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_size").cast("long").as("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
    val got = Ranked.withStrictPrecedingMax(p, "m", col("p_size"),
        col("cents"))
      .select(col("p_partkey"), col("m"))
    val want = p.withColumn("m", max(col("p_size")).over(
        Window.orderBy(col("cents"))
          .rangeBetween(Window.unboundedPreceding, -1)))
      .select(col("p_partkey"), col("m"))
    assertSameRows(got, want, "strict preceding max")
  }

  // --- face bit-identity against the r11 single-window spellings ---

  test("q_rfm == the ntile(3) window spelling") {
    val got = graft.SparkEntry.queries("q_rfm")(spark, sf)
    val per = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).cast("long").as("f_orders"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .cast("long").as("m_cents"))
    val mx = Tables.load(spark, sf, "orders")
      .agg(max(col("o_orderdate")).as("mx"))
      .withColumn("__k", expr("pmod(datediff(mx, mx), 1)"))
    val want = per.withColumn("__k", expr("pmod(f_orders, 1)"))
      .join(broadcast(mx), "__k").drop("__k")
      .withColumn("r_days",
        datediff(col("mx"), col("last_order")).cast("long"))
      .withColumn("r_score", ntile(3).over(
        Window.orderBy(col("r_days"), col("o_custkey"))))
      .withColumn("f_score", ntile(3).over(
        Window.orderBy(col("f_orders").desc, col("o_custkey"))))
      .withColumn("m_score", ntile(3).over(
        Window.orderBy(col("m_cents").desc, col("o_custkey"))))
      .select(col("o_custkey"), col("r_days"), col("f_orders"),
        col("m_cents"),
        concat(col("r_score"), col("f_score"), col("m_score"))
          .as("segment"))
    assertSameRows(got, want, "q_rfm")
  }

  test("q_conversion_lag == the collect_list median spelling") {
    val got = graft.SparkEntry.queries("q_conversion_lag")(spark, sf)
    val ev = Tables.load(spark, sf, "events")
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("v_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
    val lags = purchases.join(firstView, "user_id")
      .filter(col("p_us") >= col("v_us"))
      .groupBy(col("user_id"))
      .agg((min(col("p_us")) - max(col("v_us"))).as("lag_us"))
    val want = lags
      .withColumn("l", collect_list(col("lag_us")).over(
        Window.orderBy(col("lag_us"), col("user_id"))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .agg(count(lit(1)).cast("long").as("n_converted"),
        min(col("lag_us")).cast("long").as("min_lag_us"),
        max(col("lag_us")).cast("long").as("max_lag_us"),
        first(expr(
          "element_at(l, CAST((size(l) + 1) div 2 AS INT)) + " +
            "element_at(l, CAST(size(l) div 2 + 1 AS INT))"))
          .cast("long").as("med2_lag_us"))
    assertSameRows(got, want, "q_conversion_lag")
  }

  test("q_max_concurrency == the single-window sweep-line spelling") {
    val got = graft.SparkEntry.queries("q_max_concurrency")(spark, sf)
    val wSeq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sessions = Tables.load(spark, sf, "events")
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wSeq)))
      .withColumn("brk",
        when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("brk")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(unix_micros(col("ts"))).as("s_us"),
        max(unix_micros(col("ts"))).as("e_us"))
    val deltas = sessions
      .select(col("s_us").as("us"), lit(1L).as("d"))
      .unionByName(sessions.select(col("e_us").as("us"), lit(-1L).as("d")))
    val want = deltas.withColumn("live", sum(col("d")).over(
        Window.orderBy(col("us"), col("d").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .agg(max(col("live")).cast("long").as("peak_concurrency"),
        count(lit(1)).cast("long").as("n_endpoints"))
    assertSameRows(got, want, "q_max_concurrency")
  }

  test("q_trimmed_mean and q_gini == their window-rank spellings") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))
    val wantTrim = li
      .withColumn("rn", row_number().over(w))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
      .filter(col("rn") > expr("n div 20") &&
        col("rn") <= col("n") - expr("n div 20"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        sum(col("cents")).cast("long").as("sum_cents"))
      .select(col("l_returnflag"), col("n_kept"), col("sum_cents"),
        (col("sum_cents").cast("double") / col("n_kept").cast("double"))
          .as("trimmed_mean_cents"))
    assertSameRows(graft.SparkEntry.queries("q_trimmed_mean")(spark, sf),
      wantTrim, "q_trimmed_mean")
    val d380 = org.apache.spark.sql.types.DecimalType(38, 0)
    val wantGini = li.withColumn("rn", row_number().over(w).cast("long"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("cents").cast(d380)).as("s0"),
        sum((col("rn") * col("cents")).cast(d380)).as("s1"))
      .select(col("l_returnflag"), col("n").as("n_rows"),
        col("s0").cast("long").as("sum_cents"),
        ((lit(2).cast(d380) * col("s1")
          - (col("n") + 1).cast(d380) * col("s0")).cast("double") /
          (col("n").cast(d380) * col("s0")).cast("double")).as("gini"))
    assertSameRows(graft.SparkEntry.queries("q_gini")(spark, sf),
      wantGini, "q_gini")
  }

  test("q_abc_analysis and q_skyline == their single-window spellings") {
    val per = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .cast("long").as("cents"))
    val wantAbc = per
      .withColumn("cum", sum(col("cents")).over(
        Window.orderBy(col("cents").desc, col("l_partkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cents")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("cls",
        when(col("cum") * 100 <= col("total") * 80, "A")
          .when(col("cum") * 100 <= col("total") * 95, "B")
          .otherwise("C"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).cast("long").as("n_parts"),
        sum(col("cents")).cast("long").as("revenue_cents"))
    assertSameRows(graft.SparkEntry.queries("q_abc_analysis")(spark, sf),
      wantAbc, "q_abc_analysis")
    val p = Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_size").cast("long").as("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
    val wantSky = p.withColumn("best_cheaper", max(col("p_size")).over(
        Window.orderBy(col("cents"))
          .rangeBetween(Window.unboundedPreceding, -1)))
      .filter(col("best_cheaper").isNull ||
        col("best_cheaper") <= col("p_size"))
      .select(col("p_partkey"), col("p_size"), col("cents"))
    assertSameRows(graft.SparkEntry.queries("q_skyline")(spark, sf),
      wantSky, "q_skyline")
  }

  // --- plan shape: no unpartitioned Window over corpus-proportional rows,
  //     and the offsets branch REUSES the ranked branch's range exchange ---

  test("reworked faces carry zero GLOBALWINDOW smells in their final plans") {
    // the 7 Ranked reworks, the r12 q_null_ordering rework, and the two
    // k-bounded-window faces the GlobalLimit guard certifies
    for (name <- Seq("q_conversion_lag", "q_max_concurrency", "q_rfm",
        "q_trimmed_mean", "q_gini", "q_abc_analysis", "q_skyline",
        "q_null_ordering", "q_positional_join", "sim_hybrid_rrf")) {
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.collect()
      val n = PlanChecks.globalWindowsOverRaw(PlanChecks.finalPlan(df))
      assert(n == 0, s"$name: $n unpartitioned Window(s) over raw input")
    }
  }

  test("size gate: a small frame keeps the stock single-task window " +
      "behind the constant-key marker — bit-identical, no range " +
      "exchange, and no GLOBALWINDOW audit smell") {
    val sort = Seq(col("cents").asc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    spark.conf.set(Ranked.SmallBytesKey, (1L << 30).toString)
    try {
      val got = Ranked.withGlobalRowNumber(li, "rn", sort)
      got.collect()
      val plan = PlanChecks.finalPlan(got)
      assert(!plan.toString.contains("rangepartitioning"),
        "gated small frame should not take the ranged plan")
      assert(PlanChecks.globalWindowsOverRaw(plan) == 0,
        s"the marker partition key must keep the audit clean:\n$plan")
      val want = li.withColumn("rn",
        row_number().over(Window.orderBy(sort: _*)).cast("long"))
      assertSameRows(got.select(col("l_orderkey"), col("l_linenumber"),
        col("rn")), want.select(col("l_orderkey"), col("l_linenumber"),
        col("rn")), "gated row_number")
      val run = Ranked.withGlobalRunningSum(li, "run", col("cents"), sort)
      assert(!run.queryExecution.executedPlan.toString
        .contains("rangepartitioning"))
      val wantRun = li.withColumn("run", sum(col("cents")).over(
        Window.orderBy(sort: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      assertSameRows(run.select(col("l_orderkey"), col("l_linenumber"),
        col("run")), wantRun.select(col("l_orderkey"), col("l_linenumber"),
        col("run")), "gated running sum")
      val p = Tables.load(spark, sf, "part")
        .select(col("p_partkey"), col("p_size").cast("long").as("p_size"),
          round(col("p_retailprice") * 100).cast("long").as("cents"))
      val m = Ranked.withStrictPrecedingMax(p, "m", col("p_size"),
        col("cents"))
      assert(!m.queryExecution.executedPlan.toString
        .contains("rangepartitioning"))
      val wantM = p.withColumn("m", max(col("p_size")).over(
        Window.orderBy(col("cents"))
          .rangeBetween(Window.unboundedPreceding, -1)))
      assertSameRows(m.select(col("p_partkey"), col("m")),
        wantM.select(col("p_partkey"), col("m")), "gated strict max")
      // group regime: the stock partitioned window, no prefix machinery
      val grp = Ranked.withGroupRowNumber(li, "rn", "l_returnflag", sort,
        countOut = "n")
      val gPlan = grp.queryExecution.executedPlan.toString
      assert(!gPlan.contains("rangepartitioning") &&
        !gPlan.contains("BroadcastHashJoin"), gPlan)
      val wantGrp = li
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("l_returnflag")).orderBy(sort: _*)).cast("long"))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
      assertSameRows(
        grp.select(col("l_orderkey"), col("l_linenumber"), col("rn"), col("n")),
        wantGrp.select(col("l_orderkey"), col("l_linenumber"), col("rn"),
          col("n")), "gated group row_number")
    } finally spark.conf.set(Ranked.SmallBytesKey, "0")
  }

  test("every Ranked entry point shares ONE range exchange on a " +
      "PRUNING-PRONE frame (extra columns the offsets branch never " +
      "references) — the r13 padding fix, pinned where it matters") {
    // columns beyond the sort/value: without the exchange-identity pad,
    // ColumnPruning narrows the offsets branch below its exchange and the
    // two RangePartitioners sample boundaries independently
    val wide = li.withColumn("extra1", col("cents") * 3)
      .withColumn("extra2", concat(col("l_returnflag"), lit("x")))
    def pinOneRangeExchange(df: org.apache.spark.sql.DataFrame,
        hint: String): Unit = {
      df.collect()
      val plan = PlanChecks.finalPlan(df).toString
        .split("== Initial Plan ==")(0)
      val fresh = plan.linesIterator.count(l =>
        l.contains("Exchange rangepartitioning") &&
          !l.contains("ReusedExchange"))
      val reused = plan.linesIterator.count(l =>
        l.contains("ReusedExchange") && l.contains("rangepartitioning"))
      assert(fresh == 1, s"$hint: $fresh materialized range exchanges:\n$plan")
      assert(reused >= 1, s"$hint: offsets branch lost ReuseExchange:\n$plan")
    }
    val sort = Seq(col("cents").asc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    pinOneRangeExchange(
      Ranked.withGlobalRowNumber(wide, "rn", sort), "withGlobalRowNumber")
    pinOneRangeExchange(
      Ranked.withGlobalRunningSum(wide, "run", col("cents"), sort),
      "withGlobalRunningSum")
    pinOneRangeExchange(
      Ranked.withGroupRowNumber(wide, "rn", "l_returnflag", sort),
      "withGroupRowNumber")
    pinOneRangeExchange(
      Ranked.withStrictPrecedingMax(wide, "m", col("cents"),
        col("l_orderkey")), "withStrictPrecedingMax")
  }

  test("Ranked's two branches share ONE range exchange (ReuseExchange) — " +
      "the partition-id agreement the offsets arithmetic rests on") {
    val df = graft.SparkEntry.queries("q_trimmed_mean")(spark, sf)
    df.collect()
    val plan = PlanChecks.finalPlan(df).toString
      .split("== Initial Plan ==")(0)
    val fresh = plan.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange"))
    val reused = plan.linesIterator.count(l =>
      l.contains("ReusedExchange") && l.contains("rangepartitioning"))
    assert(fresh == 1,
      s"expected exactly one materialized range exchange, got $fresh:\n$plan")
    assert(reused >= 1,
      s"offsets branch no longer reuses the range exchange:\n$plan")
  }
}
