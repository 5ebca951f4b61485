package graft

import java.sql.Timestamp

/** Hand-computed pins for the statistical-test faces (Spearman,
  * Mann-Whitney, KS, chi-square, Cramér's V, CUSUM, autocorrelation).
  * The oracle certifies cross-engine equality at three SFs; these pins
  * certify the MATH independently — a shared misreading of a test's
  * definition on both sides would pass the oracle but fail here. Every
  * expected value is derived on paper from the textbook definition
  * (tie-averaged ranks, ECDF sup, contingency expectations).
  */
class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  /** lineitem parquet with designed quantities/discounts/flags:
    *   R rows: qty 1, 2   A rows: qty 2, 3
    * so ranks/ECDFs/margins are all hand-computable. The extra P row
    * must be IGNORED by the two-sample faces (R/A filter). */
  private lazy val liDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stats_").toString
    Seq(
      (1.0, 10.0, "R", "O"),
      (2.0, 20.0, "R", "F"),
      (2.0, 30.0, "A", "O"),
      (3.0, 40.0, "A", "F"),
      (9.0, 90.0, "P", "O") // filtered out of the two-sample tests
    ).toDF("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  /** Dedicated perfectly-monotone table: Spearman must be exactly 1.0. */
  private lazy val monoDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stats_mono_").toString
    Seq((1.0, 0.01, "R", "O"), (2.0, 0.02, "R", "O"),
      (3.0, 0.03, "A", "F"), (4.0, 0.04, "A", "F"))
      .toDF("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  /** Tied example computed on paper: x = [1,1,2], y = [5,7,7].
    * Avg ranks x: (1.5, 1.5, 3), y: (1, 2.5, 2.5) → ρ = 9/18 = 0.5. */
  private lazy val tieDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stats_tie_").toString
    Seq((1.0, 5.0, "R", "O"), (1.0, 7.0, "R", "O"), (2.0, 7.0, "R", "O"))
      .toDF("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  /** 2×2 contingency with expected=20 everywhere: χ² = 4·(10²/20) = 20,
    * V = sqrt(20/80) = 0.5 — both IEEE-exact. */
  private lazy val chiDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stats_chi_").toString
    val rows =
      Seq.fill(30)(("R", "O")) ++ Seq.fill(10)(("R", "F")) ++
      Seq.fill(10)(("A", "O")) ++ Seq.fill(30)(("A", "F"))
    rows.map { case (f, st) => (1.0, 0.0, f, st) }
      .toDF("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  /** orders with one timestamp per row; daily counts designed per test. */
  private def ordersDir(countsByDay: Seq[Int]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stats_ord_").toString
    countsByDay.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"))
    }.toDF("o_orderdate")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  test("q_spearman: perfectly monotone data gives 1 (to the sqrt ulp)") {
    val r = SparkEntry.queries("q_spearman")(spark, monoDir).collect().head
    assert(r.getLong(0) == 4L)
    // num = denom = 80 exactly, but the denominator routes through
    // sqrt(80)² = 80.00000000000001 — one ulp shy of exactly 1.0
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("q_spearman: tie-averaged ranks match the paper value 0.5") {
    val r = SparkEntry.queries("q_spearman")(spark, tieDir).collect().head
    assert(r.getLong(0) == 3L)
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)
  }

  test("q_mannwhitney: doubled ranks, U identity, non-R/A rows ignored") {
    val out = SparkEntry.queries("q_mannwhitney")(spark, liDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // pooled values 1,2,2,3 → doubled ranks: v1→2, v2→5 (avg 2.5), v3→8
    assert(out("R") == ((2L, 7L, 1L, 0.5)))  // ranks 1 + 2.5; U = 0.5
    assert(out("A") == ((2L, 13L, 7L, 3.5))) // ranks 2.5 + 4; U = 3.5
    // consistency: U_R + U_A = n_R·n_A
    assert(out("R")._3 + out("A")._3 == 2 * 2 * 2)
  }

  test("q_ks_test: ECDF sup as exact rational (overlap case D = 1/2)") {
    val r = SparkEntry.queries("q_ks_test")(spark, liDir).collect().head
    // at v=1: |1·2 − 0·2| = 2; at v=2: |2·2 − 1·2| = 2; at v=3: 0
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 2L)))
    assert(r.getDouble(3) == 0.5) // 2/4 is exact in binary
  }

  test("q_chi_square + q_cramers_v: uniform-margin 2×2 pins χ²=20, V=0.5") {
    val c = SparkEntry.queries("q_chi_square")(spark, chiDir).collect().head
    assert((c.getLong(0), c.getLong(1), c.getLong(2)) == ((80L, 4L, 1L)))
    assert(c.getDouble(3) == 20.0) // all cells (±10)²/20 = 5, IEEE-exact
    val v = SparkEntry.queries("q_cramers_v")(spark, chiDir).collect().head
    assert(v.getDouble(3) == 0.5) // sqrt(20/(80·1)) = sqrt(0.25)
  }

  test("q_cusum: scaled curve days·cum − t·total, integer-exact") {
    val out = SparkEntry.queries("q_cusum")(spark, ordersDir(Seq(1, 2, 3)))
      .orderBy("day").collect()
    // days=3, total=6; cum=[1,3,6] → s' = [3−6, 9−12, 18−18]
    assert(out.map(_.getLong(3)).toSeq == Seq(-3L, -3L, 0L))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 3L, 6L))
  }

  test("q_autocorr: alternating series is anti-correlated at lag 1 and 7") {
    val out = SparkEntry.queries("q_autocorr")(spark,
        ordersDir(Seq(1, 2, 1, 2, 1, 2, 1, 2, 1, 2)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 9L) // 9 lag-1 pairs over 10 days
    assert(out(7L)._1 == 3L)
    assert(math.abs(out(1L)._2 - (-1.0)) < 1e-9)
    assert(math.abs(out(7L)._2 - (-1.0)) < 1e-9)
  }

  test("TextOps.codeDetect: code-shaped text flags, prose does not") {
    val df = Seq(
      (1L, "def area(r):\n    return (3 * r * r);\nclass Circle { int r; }"),
      (2L, "the quick brown fox jumps over the lazy dog and keeps running")
    ).toDF("doc_id", "text")
    val out = operators.TextOps.codeDetect(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(8))      // is_code
    assert(!out(2L).getBoolean(8))
    assert(out(1L).getLong(6) >= 3L)   // def, return, class, int→no; ≥3 kws
    assert(out(2L).getLong(3) == 0L)   // prose has zero code symbols
    assert(out(1L).getLong(4) == 1L)   // one 4-space-indented line
    assert(out(1L).getLong(2) == 3L)   // n_lines = newlines + 1
  }

  test("q_theil_u: exact 1.0 on a dependent table, 0.0 on an independent one") {
    // perfectly dependent: status determines flag — H(X|Y) = 0, U = 1
    val dep = java.nio.file.Files.createTempDirectory("graft_stats_dep_").toString
    (Seq.fill(40)(("R", "O")) ++ Seq.fill(40)(("A", "F")))
      .map { case (f, st) => (1.0, 0.0, f, st) }
      .toDF("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$dep/lineitem.parquet")
    val u1 = SparkEntry.queries("q_theil_u")(spark, dep).collect().head
    assert(u1.getDouble(1) == 1.0 && u1.getDouble(2) == 0.0 &&
      u1.getDouble(3) == 1.0) // all power-of-two counts: log2 exact
    // perfectly independent uniform 2×2: H(X|Y) = H(X) = 1, U = 0
    val ind = java.nio.file.Files.createTempDirectory("graft_stats_ind_").toString
    (Seq.fill(20)(("R", "O")) ++ Seq.fill(20)(("R", "F")) ++
      Seq.fill(20)(("A", "O")) ++ Seq.fill(20)(("A", "F")))
      .map { case (f, st) => (1.0, 0.0, f, st) }
      .toDF("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$ind/lineitem.parquet")
    val u0 = SparkEntry.queries("q_theil_u")(spark, ind).collect().head
    assert(u0.getDouble(1) == 1.0 && u0.getDouble(2) == 1.0 &&
      u0.getDouble(3) == 0.0)
  }

  test("q_psi: identical half-distributions give exactly 0") {
    // two days per half, each half 3× '1-URGENT' + 1× '2-HIGH': p = q,
    // every ln(p/q) = ln(1) = 0 exactly
    val d = java.nio.file.Files.createTempDirectory("graft_stats_psi_").toString
    val rows = Seq(
      (1, "1-URGENT"), (1, "1-URGENT"), (1, "1-URGENT"), (2, "2-HIGH"),
      (3, "1-URGENT"), (3, "1-URGENT"), (3, "1-URGENT"), (4, "2-HIGH"))
    rows.map { case (day, p) =>
      (Timestamp.valueOf(f"2024-03-0$day%d 00:00:00"), p)
    }.toDF("o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = SparkEntry.queries("q_psi")(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 4L, 4L)))
    assert(r.getDouble(3) == 0.0)
  }

  test("q_ttest_welch: designed halves pin t = -sqrt(2), df = 2 exactly") {
    // R: [1,2]  A: [2,3] → means 1.5/2.5, both sample variances 0.5,
    // vn = 0.25 each, se2 = 0.5 → t = -1/sqrt(0.5) = -sqrt(2);
    // df = 0.25 / (0.0625 + 0.0625) = 2.0 with every operand IEEE-exact.
    val r = SparkEntry.queries("q_ttest_welch")(spark, liDir).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == 1.5 && r.getDouble(3) == 2.5)
    assert(r.getDouble(4) == -1.0 / math.sqrt(0.5))
    assert(r.getDouble(5) == 2.0)
  }

  test("q_anova: three designed groups pin F = 12 exactly") {
    // A:[1,2,3] B:[3,4,5] C:[5,6,7] → SSB = 24, SSW = 6,
    // F = (24/2)/(6/6) = 12 — every intermediate IEEE-exact.
    val d = java.nio.file.Files.createTempDirectory("graft_stats_an_").toString
    Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 3.0), ("B", 4.0),
      ("B", 5.0), ("C", 5.0), ("C", 6.0), ("C", 7.0))
      .map { case (g, x) => (1.0, x, g, "O") }
      .toDF("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = SparkEntry.queries("q_anova")(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 9L)))
    assert(r.getDouble(2) == 24.0 && r.getDouble(3) == 6.0)
    assert(r.getDouble(4) == 12.0)
  }

  /** events micro-table: (day-of-Jan-2024, event_type) rows. */
  private def eventsDir(rows: Seq[(Int, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stats_ev_").toString
    rows.map { case (day, t) =>
      (Timestamp.valueOf(f"2024-01-${day}%02d 00:00:00"), t)
    }.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q_js_divergence: identical mixes give 0; disjoint mixes give ln 2") {
    // days 1-2 are the 'e' half, 3-4 the 'a' half (midpoint rule)
    val same = eventsDir(Seq(1 -> "x", 1 -> "x", 2 -> "y", 2 -> "y",
      3 -> "x", 3 -> "x", 4 -> "y", 4 -> "y"))
    val r0 = SparkEntry.queries("q_js_divergence")(spark, same).collect().head
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2)) == ((2L, 4L, 4L)))
    assert(r0.getDouble(3) == 0.0) // every ln(p/m) = ln(1) = 0
    // disjoint supports: JSD reaches its ln 2 ceiling
    val disj = eventsDir(Seq(1 -> "x", 2 -> "x", 3 -> "y", 4 -> "y"))
    val r1 = SparkEntry.queries("q_js_divergence")(spark, disj).collect().head
    assert(math.abs(r1.getDouble(3) - 0.693147) < 1e-9) // round(ln 2, 6)
  }

  test("q_prop_ztest: equal shares give z = 0; designed shift pins z") {
    val flat = eventsDir(Seq(1 -> "purchase", 2 -> "view",
      3 -> "purchase", 4 -> "view"))
    val r0 = SparkEntry.queries("q_prop_ztest")(spark, flat).collect().head
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2), r0.getLong(3)) ==
      ((2L, 1L, 2L, 1L)))
    assert(r0.getDouble(6) == 0.0)
    // halves 4/4, hits 2 vs 1: z = 0.25 / sqrt(0.375·0.625·0.5)
    val shift = eventsDir(Seq(1 -> "purchase", 1 -> "purchase", 2 -> "view",
      2 -> "view", 3 -> "purchase", 3 -> "view", 4 -> "view", 4 -> "view"))
    val r1 = SparkEntry.queries("q_prop_ztest")(spark, shift).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3)) ==
      ((4L, 2L, 4L, 1L)))
    assert(r1.getDouble(6) == 0.25 / math.sqrt(0.375 * 0.625 * 0.5))
  }

  test("q_table_info: DuckDB-native type names incl. the nested FLOAT[]") {
    val rows = SparkEntry.queries("q_table_info")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3))).toMap
    assert(rows(("embeddings", 1L)) == (("embedding", "FLOAT[]")))
    assert(rows(("lineitem", 10L)) == (("l_shipdate", "TIMESTAMP")))
    assert(rows(("documents", 1L)) == (("text", "VARCHAR")))
  }
}
