package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** As-of join semantics on hand-built data: most recent right row at or
  * before the left time, per key; no match → null. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asof picks latest right row <= left time per key; unmatched → null") {
    val left = Seq(
      (1L, 10L, t("2024-01-01 12:00:00")),
      (2L, 10L, t("2024-01-03 00:00:00")),
      (3L, 20L, t("2024-01-02 00:00:00")), // key 20 has no right rows
      (4L, 10L, t("2024-01-01 00:00:00"))  // exactly at right row r1's time
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, t("2024-01-01 00:00:00")),
      (200L, 10L, t("2024-01-02 00:00:00")),
      (300L, 30L, t("2024-01-01 00:00:00"))
    ).toDF("o_id", "o_key", "o_time")

    val out = AsofJoin.asof(left, right,
      leftKey = "user_id", rightKey = "o_key",
      leftTime = "ts", rightTime = "o_time",
      rightSeq = "o_id", rightVals = Seq("o_id"))
      .select("event_id", "o_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out(1L) == 100L) // between r1 and r2 → r1
    assert(out(2L) == 200L) // after both → r2
    assert(out(3L) == -1L)  // no rows for key 20
    assert(out(4L) == 100L) // equal times: right row at left time matches
  }

  test("a NULL value in the most recent right row is NOT replaced by an older row's value") {
    val left = Seq((1L, 10L, t("2024-01-03 00:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, t("2024-01-01 00:00:00"), Some("old-note")),
      (200L, 10L, t("2024-01-02 00:00:00"), None: Option[String])
    ).toDF("o_id", "o_key", "o_time", "note")
    val out = AsofJoin.asof(left, right, "user_id", "o_key", "ts", "o_time",
      "o_id", Seq("o_id", "note")).collect()(0)
    assert(out.getAs[Long]("o_id") == 200L) // most recent row attached...
    assert(out.isNullAt(out.fieldIndex("note"))) // ...with its genuinely-null value
  }

  test("forward asof picks earliest right row >= left time; tolerance nulls far matches") {
    import org.apache.spark.sql.functions.expr
    val left = Seq(
      (1L, 10L, t("2024-01-01 12:00:00")), // next is r2 at 01-02
      (2L, 10L, t("2024-01-02 00:00:00")), // exactly at r2 → matches (inclusive)
      (3L, 10L, t("2024-01-05 00:00:00")), // nothing after → null
      (4L, 20L, t("2024-01-01 00:00:00"))  // key 20 has no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, t("2024-01-01 00:00:00")),
      (200L, 10L, t("2024-01-02 00:00:00"))
    ).toDF("o_id", "o_key", "o_time")
    val fwd = AsofJoin.asof(left, right, "user_id", "o_key", "ts", "o_time",
      "o_id", Seq("o_id"), forward = true)
      .select("event_id", "o_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fwd == Map(1L -> 200L, 2L -> 200L, 3L -> -1L, 4L -> -1L))

    // tolerance: only matches within 6 hours survive
    val tol = AsofJoin.asof(left, right, "user_id", "o_key", "ts", "o_time",
      "o_id", Seq("o_id"), forward = true,
      tolerance = (lt, rt) => rt <= lt + expr("INTERVAL 6 HOURS"))
      .select("event_id", "o_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(tol == Map(1L -> -1L, 2L -> 200L, 3L -> -1L, 4L -> -1L))

    // backward with tolerance: event 12h after r1 fails a 6h bound
    val btol = AsofJoin.asof(left, right, "user_id", "o_key", "ts", "o_time",
      "o_id", Seq("o_id"),
      tolerance = (lt, rt) => rt >= lt - expr("INTERVAL 6 HOURS"))
      .select("event_id", "o_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(btol == Map(1L -> -1L, 2L -> 200L, 3L -> -1L, 4L -> -1L))
  }

  test("asof is a single shuffle (window), no range-join blowup") {
    val left = Seq((1L, 10L, t("2024-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, t("2024-01-01 00:00:00"))).toDF("o_id", "o_key", "o_time")
    val plan = AsofJoin.asof(left, right, "user_id", "o_key", "ts", "o_time",
      "o_id", Seq("o_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.toLowerCase.contains("broadcastnestedloop"))
  }

  test("nearest asof: closer side wins, exact ties keep backward, one-sided falls through") {
    val left = Seq(
      (1L, 10L, t("2024-01-02 00:00:00")), // 1d after r1, 2d before r2 → r1
      (2L, 10L, t("2024-01-03 12:00:00")), // 2.5d after r1, 0.5d before r2 → r2
      (3L, 10L, t("2024-01-02 12:00:00")), // exactly midway → backward (r1)
      (4L, 10L, t("2023-12-01 00:00:00")), // before all rights → forward r1
      (5L, 10L, t("2024-05-01 00:00:00")), // after all rights → backward r2
      (6L, 20L, t("2024-01-01 00:00:00"))  // keyless → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, t("2024-01-01 00:00:00")),
      (200L, 10L, t("2024-01-04 00:00:00"))
    ).toDF("o_id", "o_key", "o_time")

    val out = AsofJoin.asofNearest(left, right,
      leftKey = "user_id", rightKey = "o_key",
      leftTime = "ts", rightTime = "o_time",
      rightSeq = "o_id", rightVals = Seq("o_id"))
      .select("event_id", "o_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out == Map(1L -> 100L, 2L -> 200L, 3L -> 100L,
      4L -> 100L, 5L -> 200L, 6L -> -1L))
  }

  test("nearest asof fuses both directions under ONE exchange") {
    val left = Seq((1L, 10L, t("2024-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, t("2024-01-01 00:00:00"))).toDF("o_id", "o_key", "o_time")
    val plan = AsofJoin.asofNearest(left, right, "user_id", "o_key", "ts",
      "o_time", "o_id", Seq("o_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.toLowerCase.contains("broadcastnestedloop"))
    // both window passes share the key partitioning: exactly one SHUFFLE.
    // Match the shuffle operator specifically — a bare "Exchange" count
    // also hits BroadcastExchange/ReusedExchange, so a benign planner
    // change (e.g. exchange reuse) would flip it without a real regression.
    assert(plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      s"expected exactly 1 shuffle Exchange in:\n$plan")
  }
}
