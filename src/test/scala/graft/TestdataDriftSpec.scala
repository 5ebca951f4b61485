package graft

import org.apache.spark.sql.types.TimestampType

/** Guards against driver-side testdata drift: round 8 lost nine faces when
  * events.parquet:ts silently became TIMESTAMP(MICROS, isAdjustedToUTC=false)
  * (Spark TIMESTAMP_NTZ) and every `unix_micros(ts)` call failed analysis —
  * while the suite stayed green because operator specs synthesize their own
  * events with TimestampType. This spec reads the REAL driver parquet through
  * `Tables.load` and drives a `unix_micros`-using face end-to-end, so a future
  * physical-type drift turns the suite red instead of only the round artifact.
  */
class TestdataDriftSpec extends SparkSpec {

  test("Tables.load normalizes events.ts to TimestampType on real testdata") {
    val events = Tables.load(spark, sf, "events")
    val tsField = events.schema.fields.find(_.name == "ts").get
    assert(tsField.dataType == TimestampType,
      s"events.ts must load as TimestampType (got ${tsField.dataType}); " +
        "unix_micros / watermark faces reject NTZ and raw longs")
  }

  test("q_window_lag runs against real driver testdata") {
    val out = SparkEntry.queries("q_window_lag")(spark, sf)
    assert(out.count() > 0)
    // Gaps are non-negative within each user's ts-ordered stream.
    assert(out.filter("gap_us < 0").count() == 0)
  }

  test("every table loads and exposes no NTZ timestamp column anywhere") {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sf, n)
      df.schema.fields.foreach { f =>
        assert(f.dataType != TimestampNTZType,
          s"$n.${f.name} leaked TIMESTAMP_NTZ through Tables.load")
      }
      df.schema.fields.filter(_.name == "ts").foreach { f =>
        assert(f.dataType != LongType,
          s"$n.ts leaked raw-long nanos through Tables.load")
      }
    }
  }
}
