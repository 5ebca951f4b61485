package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for UNPARTITIONED-window idioms (global
  * `row_number` / `ntile` / running aggregates): every spelling here keeps
  * the corpus-proportional rows inside PARTITIONED windows and reserves
  * the one unavoidable unpartitioned window for the nPart-row per-partition
  * summary table — driver-state stays O(partitions), never O(rows).
  *
  * The shape (the classic distributed prefix computation):
  *   1. `repartitionByRange` on the sort key — Spark's range exchange
  *      spreads the global order across every core AND guarantees rows
  *      with EQUAL keys land in the same partition (boundary lookup is a
  *      binary search over sampled split points, consistent for ties);
  *   2. a per-partition window keyed on `spark_partition_id()` computes
  *      the within-partition rank / running aggregate;
  *   3. a per-partition summary (count / sum / max — nPart rows) turns
  *      into exclusive prefix offsets via a window over those nPart rows,
  *      and a broadcast join folds offsets back in.
  * Steps 2 and 3 read the SAME range exchange (identical subtrees —
  * Spark's ReuseExchange dedupes them), so the partition ids agree by
  * construction; `RankedSpec` pins bit-identity against the
  * single-window spellings.
  *
  * Callers must pass a TOTAL order in `sort` (tie-break on a key column)
  * when exact per-row ranks matter; running aggregates only need ties to
  * be value-identical (any tie order yields the same prefix set).
  */
object Ranked {

  private val PID = "__rk_pid"

  private def parted(df: DataFrame, sort: Seq[Column], nPart: Int): DataFrame = {
    val n = if (nPart > 0) nPart
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // the pid projects ABOVE the range exchange (spark_partition_id is
    // non-deterministic, so Catalyst cannot push it past the shuffle) —
    // each row reads its range-bucket id
    df.repartitionByRange(n, sort: _*)
      .withColumn(PID, spark_partition_id().cast("long"))
  }

  /** nPart-row exclusive prefix over a per-partition summary: the ONLY
    * unpartitioned window in the machinery, always sitting above an
    * Aggregate whose output is partition-count-sized. */
  private def offsets(p: DataFrame, summary: Column, prefix: Column => Column)
      : DataFrame =
    p.groupBy(col(PID)).agg(summary.as("__rk_t"))
      .withColumn("__rk_off", prefix(col("__rk_t")))
      .select(col(PID), col("__rk_off"))

  private def exclusivePrefix(agg: Column => Column)(t: Column): Column =
    agg(t).over(Window.orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1))

  /** Global 1-based `row_number()` ordered by `sort`, as `out` (LONG).
    * Bit-identical to `row_number().over(Window.orderBy(sort))` when
    * `sort` is a total order. */
  def withGlobalRowNumber(df: DataFrame, out: String, sort: Seq[Column],
      nPart: Int = 0): DataFrame = {
    val p = parted(df, sort, nPart)
    val ranked = p.withColumn("__rk_rn",
      row_number().over(Window.partitionBy(col(PID)).orderBy(sort: _*))
        .cast("long"))
    val offs = offsets(p, count(lit(1)),
      t => coalesce(exclusivePrefix(sum)(t), lit(0L)))
    ranked.join(broadcast(offs), Seq(PID))
      .withColumn(out, col("__rk_off") + col("__rk_rn"))
      .drop(PID, "__rk_rn", "__rk_off")
  }

  /** PER-GROUP 1-based `row_number()` (the
    * `Window.partitionBy(group).orderBy(sort)` replacement for the
    * few-huge-groups regime): global rank over `(group, sort)` minus the
    * group's exclusive prefix count. `groupName` must be non-null (it
    * keys an equi-join) and group-count-sized. Pass `countOut` to also
    * keep the group's row count as a column (saves callers a second
    * aggregate scan for n-dependent trims). */
  def withGroupRowNumber(df: DataFrame, out: String, groupName: String,
      sort: Seq[Column], nPart: Int = 0, countOut: String = null): DataFrame = {
    val g = withGlobalRowNumber(df, "__rk_grn", col(groupName).asc +: sort, nPart)
    // group ordering here MUST match the range sort's asc group order
    val gOff = df.groupBy(col(groupName)).agg(count(lit(1)).as("__rk_gc"))
      .withColumn("__rk_goff", coalesce(
        sum(col("__rk_gc")).over(Window.orderBy(col(groupName))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val keep =
      if (countOut == null) gOff.select(col(groupName), col("__rk_goff"))
      else gOff.select(col(groupName), col("__rk_goff"),
        col("__rk_gc").as(countOut))
    g.join(broadcast(keep), Seq(groupName))
      .withColumn(out, col("__rk_grn") - col("__rk_goff"))
      .drop("__rk_grn", "__rk_goff")
  }

  /** Global running SUM of `value` over the `sort` order
    * (ROWS UNBOUNDED PRECEDING .. CURRENT ROW), as `out`. The maximum of
    * the result is tie-order-independent (equal sort keys carry equal
    * deltas, so within-tie permutations only reorder a monotonic run). */
  def withGlobalRunningSum(df: DataFrame, out: String, value: Column,
      sort: Seq[Column], nPart: Int = 0): DataFrame = {
    val p = parted(df, sort, nPart)
    val run = p.withColumn("__rk_run",
      sum(value).over(Window.partitionBy(col(PID)).orderBy(sort: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = offsets(p, sum(value),
      t => coalesce(exclusivePrefix(sum)(t), lit(0L)))
    run.join(broadcast(offs), Seq(PID))
      .withColumn(out, col("__rk_off") + col("__rk_run"))
      .drop(PID, "__rk_run", "__rk_off")
  }

  /** MAX of `value` over all rows whose `orderKey` is STRICTLY smaller
    * (the `RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING` frame), as
    * `out` — NULL when no strictly-smaller row exists. Equal keys share a
    * partition, so earlier partitions are strictly smaller and their
    * whole-partition max folds in via `greatest` (which skips NULLs). */
  def withStrictPrecedingMax(df: DataFrame, out: String, value: Column,
      orderKey: Column, nPart: Int = 0): DataFrame = {
    val p = parted(df, Seq(orderKey), nPart)
    val run = p.withColumn("__rk_in",
      max(value).over(Window.partitionBy(col(PID)).orderBy(orderKey)
        .rangeBetween(Window.unboundedPreceding, -1)))
    val offs = offsets(p, max(value), exclusivePrefix(max))
    run.join(broadcast(offs), Seq(PID))
      .withColumn(out, greatest(col("__rk_in"), col("__rk_off")))
      .drop(PID, "__rk_in", "__rk_off")
  }
}
