package graft.operators

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.SparkSpec

/** Timestamp-flavor hardening: parquet written with isAdjustedToUTC=false
  * loads as TIMESTAMP_NTZ, which `unix_micros` and watermark analysis
  * reject (the r8 testdata drift). Scd2.fromChangeLog and
  * Upsert.upsertVersioned normalize at entry so operator-level callers —
  * not just the Tables.load-mediated faces — get TimestampType out and
  * identical results from either input flavor. */
class TimestampFlavorSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
  private def ntz(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampNTZType)))

  private val log = Seq(
    (1L, t(0), 10L, "a"), (1L, t(5), 11L, "b"), (2L, t(3), 20L, "x")
  ).toDF("k", "ts", "chg_id", "v")

  test("Scd2.fromChangeLog: NTZ input → TimestampType output, same rows") {
    val fromTz  = Scd2.fromChangeLog(log, Seq("k"), "ts", Seq("chg_id"))
    val fromNtz = Scd2.fromChangeLog(ntz(log, "ts"), Seq("k"), "ts", Seq("chg_id"))
    Seq("ts", "valid_from", "valid_to").foreach { c =>
      assert(fromNtz.schema(c).dataType == TimestampType,
        s"$c must come out TimestampType")
    }
    // unix_micros — the exact call that died in r8 — works on the output…
    assert(fromNtz.select(unix_micros($"valid_from")).count() == 3)
    // …and both flavors produce identical intervals (UTC session: same instants).
    val a = fromTz.orderBy("chg_id").collect().toSeq
    val b = fromNtz.orderBy("chg_id").collect().toSeq
    assert(a == b)
  }

  test("upsertVersioned: mixed flavors merge without analysis error, TimestampType out") {
    val target  = Seq((1L, t(0), "old"), (2L, t(1), "keep")).toDF("k", "ts", "v")
    val updates = Seq((1L, t(5), "new"), (3L, t(2), "ins")).toDF("k", "ts", "v")
    // target tz vs updates NTZ — the struct version compare would fail
    // analysis on mismatched types without entry normalization.
    val out = Upsert.upsertVersioned(target, ntz(updates, "ts"), Seq("k"), Seq("ts"))
    assert(out.schema("ts").dataType == TimestampType)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m == Map(1L -> "new", 2L -> "keep", 3L -> "ins"))
    // Both-NTZ input agrees with both-tz input row-for-row.
    val allNtz = Upsert.upsertVersioned(ntz(target, "ts"), ntz(updates, "ts"),
      Seq("k"), Seq("ts")).orderBy("k").collect().toSeq
    val allTz = Upsert.upsertVersioned(target, updates,
      Seq("k"), Seq("ts")).orderBy("k").collect().toSeq
    assert(allNtz == allTz)
  }

  test("NTZ cast preserves the instant under the UTC-pinned session") {
    val df = Seq(Tuple1(LocalDateTime.of(2024, 1, 1, 0, 0))).toDF("ts")
    assert(df.schema("ts").dataType == TimestampNTZType)
    val micros = df.select(unix_micros($"ts".cast("timestamp"))).as[Long].head()
    assert(micros == 1704067200000000L) // 2024-01-01T00:00:00Z
  }
}
