package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The xlsx roundtrip is the reference's identity: write nation as a
    * workbook with our writer, scan it back through
    * spark.read.format("xlsx") (25 rows at every SF). */
  def entry(spark: SparkSession): DataFrame =
    queries("xlsx_scan_roundtrip")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.XlsxQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ExtendedQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.XlsxQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.ExtendedQueries.oracleSql
}
