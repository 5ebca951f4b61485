package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** SCD2 build: chained validity intervals, current-version flag, and
  * deterministic zero-length intervals on same-instant ties. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("intervals chain per key; ties resolve by tiebreak; last version is current") {
    val log = Seq(
      (1L, t(0), 10L, "a"),
      (1L, t(5), 11L, "b"),
      (1L, t(5), 12L, "c"), // same instant as 11: tiebreak orders 11 before 12
      (1L, t(9), 13L, "d"),
      (2L, t(3), 20L, "x")  // lone change: immediately current
    ).toDF("k", "ts", "chg_id", "v")
    val out = Scd2.fromChangeLog(log, Seq("k"), "ts", tiebreak = Seq("chg_id"))
      .select("chg_id", "valid_from", "valid_to", "is_current")
      .collect().map(r => r.getLong(0) ->
        ((r.getTimestamp(1), Option(r.getTimestamp(2)), r.getBoolean(3)))).toMap
    assert(out(10L) == ((t(0), Some(t(5)), false)))
    assert(out(11L) == ((t(5), Some(t(5)), false))) // zero-length, deterministic
    assert(out(12L) == ((t(5), Some(t(9)), false)))
    assert(out(13L) == ((t(9), None, true)))
    assert(out(20L) == ((t(3), None, true)))
  }
}
