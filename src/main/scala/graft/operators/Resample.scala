package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series resampling with gap fill — the warehouse pass that turns an
  * irregular event stream into a dense per-key daily grid (training-data
  * pipelines need it for per-source activity features; BI needs it for
  * continuity). For each key: one row per calendar day from the key's
  * first to last event, observed days carrying that day's aggregates and
  * LAST event value, gap days forward-filling the most recent value.
  *
  * Scale shape: one (key, day) map-side-combinable aggregate, a per-key
  * span aggregate riding the same key partitioning, a bounded explode
  * (span is days-of-history per key, NOT event volume — 10 years ≈ 3653
  * rows/key), and ONE key-shuffled window for the forward fill. No
  * cartesians, nothing driver-side; 100 TB of events densifies into
  * |keys| × |days| rows.
  *
  * Determinism: the day's representative value is the max_by over
  * (ts, event_id) — the unique latest event — and daily sums go through
  * decimal, so every emitted cell is shuffle-order-proof.
  */
object Resample {

  /** @param tiebreak column making same-instant events deterministic (the
    *   AsofJoin rightSeq posture) — (ts, tiebreak) must be unique per key */
  def daily(events: DataFrame, key: String = "user_id", ts: String = "ts",
      value: String = "value", tiebreak: String = "event_id"): DataFrame = {
    val obs = events
      .groupBy(col(key), date_trunc("day", col(ts)).cast("date").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(value).cast(DecimalType(18, 4))).cast("double").as("day_sum"),
        max_by(col(value), struct(col(ts), col(tiebreak))).as("day_last"))
    // span rides the (key, day) aggregate's partitioning: grouping by a
    // prefix of the keys re-exchanges only if AQE coalesced — one logical
    // key pass either way
    val span = obs.groupBy(col(key))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(key),
        explode(sequence(col("__d0"), col("__d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    span.join(obs, Seq(key, "day"), "left")
      .select(col(key), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_sum"),
        last(col("day_last"), ignoreNulls = true).over(w).as("filled_value"),
        col("n_events").isNull.as("is_gap"))
  }
}
