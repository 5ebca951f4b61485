package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Daily resample + forward fill: dense per-key day grid, gap rows carry
  * the most recent observed value, per-day last value is deterministic
  * under same-day ties. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def t(d: Int, h: Int) =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("gap days forward-fill; observed days aggregate; spans are per-key") {
    val events = Seq(
      // u1: events on day 1 and day 4 — days 2,3 are gaps
      (1L, t(1, 9), 1L, "click", 10.0),
      (2L, t(1, 17), 1L, "view", 20.0), // same day, later → day_last = 20.0
      (3L, t(4, 8), 1L, "click", 40.0),
      // u2: a single day → one row, no gaps
      (4L, t(2, 12), 2L, "click", 7.5)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Resample.daily(events).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out.size == 5) // u1: 4 days, u2: 1 day
    assert(out((1L, "2024-01-01")) == ((2L, Some(30.0), 20.0, false)))
    assert(out((1L, "2024-01-02")) == ((0L, None, 20.0, true))) // gap carries 20.0
    assert(out((1L, "2024-01-03")) == ((0L, None, 20.0, true)))
    assert(out((1L, "2024-01-04")) == ((1L, Some(40.0), 40.0, false)))
    assert(out((2L, "2024-01-02")) == ((1L, Some(7.5), 7.5, false)))
  }

  test("same-instant ties resolve by event_id (max_by struct order)") {
    val events = Seq(
      (1L, t(1, 9), 1L, "a", 1.0),
      (2L, t(1, 9), 1L, "b", 2.0) // same ts, higher event_id wins
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Resample.daily(events).collect()
    assert(out.length == 1 && out(0).getDouble(4) == 2.0)
  }
}
