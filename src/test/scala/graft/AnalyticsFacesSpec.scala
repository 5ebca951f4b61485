package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Pins the three event-analytics faces added in the r8 snapshot commit
  * (funnel, cohort retention, transitions) — previously oracle-green but
  * spec-less. Each test builds a tiny hand-computable event log, so the
  * null-comparison and plan-shape semantics are pinned independently of
  * the driver data.
  */
class AnalyticsFacesSpec extends SparkSpec {
  import spark.implicits._

  private def t(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  /** Events parquet written to a temp dir so the faces (which call
    * Tables.load on a directory) can run against it. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_analytics_").toString
    val ev = Seq(
      // u1: view → click → purchase (in order): counts at every step
      (1L, t(1), 1L, "view", 0.0, "{}"),
      (2L, t(2), 1L, "click", 0.0, "{}"),
      (3L, t(3), 1L, "purchase", 0.0, "{}"),
      // u2: click BEFORE view: reaches "view" but not "view>click"
      (4L, t(1), 2L, "click", 0.0, "{}"),
      (5L, t(2), 2L, "view", 0.0, "{}"),
      // u3: view only, same-instant click (ties count via <=)
      (6L, t(4), 3L, "view", 0.0, "{}"),
      (7L, t(4), 3L, "click", 0.0, "{}"),
      // u4: no view at all
      (8L, t(5), 4L, "purchase", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q_funnel: temporal step counts with <= tie semantics") {
    val out = SparkEntry.queries("q_funnel")(spark, dir)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map(
      "all_users" -> 4L, "view" -> 3L,
      "view>click" -> 2L, // u1 (ordered) + u3 (same instant); NOT u2 (reversed)
      "view>click>purchase" -> 1L))
  }

  test("q_transitions: END sentinel closes every user's sequence") {
    val out = SparkEntry.queries("q_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("view", "click")) == 2L)   // u1, u3 (tie broken by event_id)
    assert(out(("click", "purchase")) == 1L)
    assert(out(("purchase", "END")) == 2L) // u1, u4 terminals
    assert(out(("view", "END")) == 1L)     // u2 ends on view
    assert(out.values.sum == 8L)           // every event contributes one edge
  }

  test("q_anomaly: integer-cents thresholds; exactly 2x the trailing mean " +
      "is NOT flagged (strict >); warmup days below n_trail=3 excluded") {
    val d = java.nio.file.Files.createTempDirectory("graft_anom_").toString
    // u1: three 10.00 days; day 4 at 20.00 sits EXACTLY on 2× the trailing
    // mean (2000·3 == 2·3000 — strict > keeps it unflagged); day 5 at
    // 25.01 clears its trailing mean of {10,10,10,20} = 12.50 by more than
    // 2× (2501·4 = 10004 > 2·5000) — flagged
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "buy", 10.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-02 01:00:00"), 1L, "buy", 10.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-03 01:00:00"), 1L, "buy", 10.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-04 01:00:00"), 1L, "buy", 20.0, "{}"),
      (5L, Timestamp.valueOf("2024-01-05 01:00:00"), 1L, "buy", 25.01, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("q_anomaly")(spark, d).collect()
      .map(r => r.getDate(1).toString -> ((r.getLong(2), r.getBoolean(5)))).toMap
    // days 1-3 have < 3 trailing observations → excluded
    assert(out.keySet == Set("2024-01-04", "2024-01-05"))
    assert(out("2024-01-04") == ((2000L, false)))
    assert(out("2024-01-05") == ((2501L, true)))
  }

  test("q_cohort: first-week cohorts, one shuffle of the event stream") {
    // Spread users across two ISO weeks (2024-01-01 and 2024-01-08 are Mondays)
    val d = java.nio.file.Files.createTempDirectory("graft_cohort_").toString
    Seq(
      (1L, Timestamp.valueOf("2024-01-02 00:00:00"), 1L, "view", 0.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-09 00:00:00"), 1L, "view", 0.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-10 00:00:00"), 1L, "view", 0.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-09 00:00:00"), 2L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val res = SparkEntry.queries("q_cohort")(spark, d)
    val rows = res.collect()
      .map(r => (r.getDate(0).toString, r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows == Map(
      ("2024-01-01", "2024-01-01") -> ((0L, 1L)),  // u1 week 0
      ("2024-01-01", "2024-01-08") -> ((1L, 1L)),  // u1 retained week 1
      ("2024-01-08", "2024-01-08") -> ((0L, 1L)))) // u2's own cohort
    // Scale shape: exactly two Exchanges — one on user_id for the fused
    // (min, collect_set) aggregate, one for the vocabulary-sized rollup.
    // The r8 distinct+join shape paid three.
    // AQE's toString prints Final AND Initial plans — count only the final.
    val plan = res.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges:\n$plan")
  }

  test("q_ewma dyadic weights and q_rolling_median half-cent medians " +
      "match hand arithmetic") {
    val d = java.nio.file.Files.createTempDirectory("graft_ewma_").toString
    Seq(
      (1L, t(1), 1L, "buy", 1.0, "{}"),
      (2L, t(2), 1L, "buy", 2.0, "{}"),
      (3L, t(3), 1L, "buy", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    // EWMA: trail [100], [100,200], [100,200,300]; weight 2^(i-1) puts
    // 2^(m-1) on the newest; den = 2^m - 1
    val ew = SparkEntry.queries("q_ewma")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(ew == Map(1L -> ((100L, 1L)), 2L -> ((500L, 3L)),
      3L -> ((1700L, 7L))))
    // rolling median in half-cents: singleton doubles the middle; the
    // even trail sums the two middles
    val rm = SparkEntry.queries("q_rolling_median")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(rm == Map(1L -> 200L, 2L -> 300L, 3L -> 400L))
  }

  test("q_attribution: last preceding touch wins; touchless purchases " +
      "credit DIRECT") {
    val out = SparkEntry.queries("q_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // u1's purchase follows view then click → click credited; u4's
    // purchase has no prior touch in its stream → DIRECT
    assert(out == Map("click" -> ((1L, 0L)), "DIRECT" -> ((1L, 0L))))
  }

  test("q_seq_pattern: journey strings in (ts, event_id) order; funnel " +
      "regex counts leftmost non-overlapping matches") {
    val out = SparkEntry.queries("q_seq_pattern")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // u1 "vcp" → 1 funnel; u2 "cv" (click BEFORE view) → 0; u3 "vc"
    // (same-instant tie broken by event_id: view first) → 0; u4 "p" → 0
    assert(out == Map(1L -> ((3L, 1L)), 2L -> ((2L, 0L)),
      3L -> ((2L, 0L)), 4L -> ((1L, 0L))))
    // leftmost non-overlapping semantics on a journey with a shared
    // boundary: "vcp|vp" counts 2 — the second match starts after the
    // first ends, not inside it
    val n = spark.range(1)
      .select(expr("size(regexp_extract_all('vcpvpvv', 'vc*p', 0))"))
      .head().getInt(0)
    assert(n == 2)
  }
}
