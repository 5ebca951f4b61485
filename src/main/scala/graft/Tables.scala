package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver-generated TPC-H-ish testdata.
  * One parquet file per table under the scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // raw long (spark.sql.legacy.parquet.nanosAsLong=true, set in
    // Verify/Bench/specs). Convert to a microsecond timestamp here so every
    // consumer sees a proper timestamp column.
    // Floor division via pmod: `ts div 1000` truncates toward zero, which
    // rounds pre-1970 nanos the wrong way.
    if (name == "events" && df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
    else df
  }

  /** Register every table as a temp view so the same queries run via
    * `spark.sql` (SQL parity with the reference's DuckDB surface). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
