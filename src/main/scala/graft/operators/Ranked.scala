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

  /** Partition-id agreement between the ranked branch and the offsets
    * branch rests on physical ReuseExchange deduplicating the two
    * identical range exchanges. With reuse disabled the two
    * RangePartitioners sample split points independently and may pick
    * different boundaries — so every public entry point falls back to the
    * stock single-window spelling under that (non-default) config rather
    * than risk silently wrong prefixes. The fallback also fires when the
    * frame carries a non-orderable (map-typed) column: such a column
    * cannot ride the range keys (see [[paddedKeys]]), so the two branches
    * would prune differently and lose the shared exchange. */
  private def rankedSafe(df: DataFrame): Boolean =
    df.sparkSession.sessionState.conf.exchangeReuseEnabled &&
      df.queryExecution.analyzed.output.forall(a =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(a.dataType))

  /** Size gate (r12 VERDICT brief #4): frames whose optimized-plan size
    * estimate sits at or under `spark.graft.ranked.smallBytes` (default
    * 8 MiB; 0 disables the gate) keep Spark's stock single-task window —
    * bit-identical output, one small exchange instead of the ranged
    * plan's three. The stock spelling partitions by a CONSTANT marker
    * column so the plan itself records that the single task was a gated
    * decision, not an accident (`tools.PlanChecks` flags unpartitioned
    * windows as scale smells; a gated window is partitioned by the
    * marker). The conservative direction is a SMALL threshold: logical
    * estimates overestimate joins and unfiltered scans, so a frame would
    * need stats off by orders of magnitude before a truly large input
    * mis-gates into one task. */
  val SmallBytesKey = "spark.graft.ranked.smallBytes"

  private def small(df: DataFrame): Boolean = {
    val t = df.sparkSession.conf.get(SmallBytesKey, (8L << 20).toString).toLong
    t > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(t)
  }

  private val SMALL = "__rk_small"

  /** The marker key: constant 0 for every row, but NOT foldable (it
    * references a real column), so FoldablePropagation cannot strip it
    * from the window's partitionSpec — the same `pmod(col, 1)` derived-
    * key trick the faces use for 1-row stats joins. */
  private def smallKey(df: DataFrame): Column =
    pmod(hash(col(df.columns.head)), lit(1))

  private def smallWin(sort: Seq[Column]) =
    Window.partitionBy(col(SMALL)).orderBy(sort: _*)

  /** The sort keys PLUS every remaining output column (ascending) — the
    * exchange-identity pad. Catalyst's ColumnPruning pushes projections
    * below RepartitionByExpression, so if the offsets branch needed fewer
    * columns than the ranked branch the two range-exchange subtrees would
    * stop canonicalizing equal, ReuseExchange would not dedupe them, and
    * the two RangePartitioners would sample split points INDEPENDENTLY —
    * silently wrong prefixes whenever the sampled boundaries disagree
    * (caught by GlobalRowNumberRewriteSpec in r13). Referencing every
    * column in the partition keys pins the whole row below the exchange
    * in both branches. The pad only REFINES the caller's sort: rows with
    * equal `sort` keys may now split across adjacent partitions, but both
    * branches still see the identical refined order, so ranks stay
    * consistent and per-tie-group rank sets are unchanged (tie order
    * inside a window is unspecified either way). */
  private def paddedKeys(df: DataFrame, sort: Seq[Column]): Seq[Column] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    // Pad columns come from the ANALYZED output attributes directly (the
    // optimizer-rule twin's AttributeSet/exprId discipline): col(name)
    // round-trips through names, which is ambiguous on frames with
    // duplicate column names (common after joins) and can silently drop a
    // needed pad key on a name collision. Sort references resolved against
    // this frame are excluded by exprId; unresolved references (callers
    // passing bare col("x")) fall back to name exclusion — and an
    // over-included pad key is harmless (the pad only REFINES the order),
    // while a dropped one would weaken the exchange-identity pin.
    val sortRefAttrs = sort.flatMap(c => ColumnBridge.expression(c).references)
    val resolvedIds = AttributeSet(sortRefAttrs.filter(_.resolved))
    val unresolvedNames =
      sortRefAttrs.filterNot(_.resolved).map(_.name).toSet
    val pad = df.queryExecution.analyzed.output.collect {
      case a if !resolvedIds.contains(a) && !unresolvedNames.contains(a.name) =>
        ColumnBridge.column(a).asc
    }
    sort ++ pad
  }

  private def parted(df: DataFrame, sort: Seq[Column], nPart: Int): DataFrame = {
    val n = if (nPart > 0) nPart
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // the pid projects ABOVE the range exchange (spark_partition_id is
    // non-deterministic, so Catalyst cannot push it past the shuffle) —
    // each row reads its range-bucket id
    df.repartitionByRange(n, paddedKeys(df, sort): _*)
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
    if (!rankedSafe(df)) return df.withColumn(out,
      row_number().over(Window.orderBy(sort: _*)).cast("long"))
    if (small(df)) return df.withColumn(SMALL, smallKey(df))
      .withColumn(out, row_number().over(smallWin(sort)).cast("long"))
      .drop(SMALL)
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
    if (!rankedSafe(df) || small(df)) {
      // small regime: the stock group-partitioned window IS the right
      // plan (one task per group, input bounded by the gate) — cheaper
      // than global-rank-minus-prefix and already audit-clean
      val base = df.withColumn(out, row_number().over(
        Window.partitionBy(col(groupName)).orderBy(sort: _*)).cast("long"))
      return if (countOut == null) base
        else base.withColumn(countOut,
          count(lit(1)).over(Window.partitionBy(col(groupName))))
    }
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
    if (!rankedSafe(df)) return df.withColumn(out,
      sum(value).over(Window.orderBy(sort: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    if (small(df)) return df.withColumn(SMALL, smallKey(df))
      .withColumn(out, sum(value).over(smallWin(sort)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop(SMALL)
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

  /** Global `lag` (n > 0 looks back) / `lead` (pass [[withGlobalLead]])
    * over the `sort` order, as `out`; `default` fills where the offset row
    * does not exist (exactly SQL's `lag(value, n, default)`).
    *
    * Offset functions are the one global-window family the
    * [[graft.plans.GlobalRowNumberRewrite]] optimizer rule deliberately
    * does NOT rewrite: they are tie-order-SENSITIVE (a different tie
    * resolution changes the output value multiset, not just which peer
    * gets which label), so silently re-planning a user's query could
    * change observable results on tied data. This explicit operator is
    * the honest surface — callers pass a TOTAL `sort` order.
    *
    * Shape: one range shuffle (the shared [[parted]] machinery), a local
    * per-partition lag, and a BOUNDARY FIX for the first/last n rows of
    * each partition: any row within n global positions of a
    * later-partition row is within the last n rows of its own partition,
    * so the fix table (rows within n of either partition edge, keyed by
    * the global position they supply) is at most 2·n·nPart rows —
    * broadcast, never a corpus self-join. Keep n far below the expected
    * partition size: the fix table grows with n (at n ≳ rows/nPart every
    * row is boundary and the broadcast degenerates to the corpus). */
  def withGlobalLag(df: DataFrame, out: String, value: Column, n: Int,
      default: Column, sort: Seq[Column], nPart: Int = 0): DataFrame =
    withGlobalOffset(df, out, value, -n, default, sort, nPart)

  /** Global `lead(value, n, default)` — see [[withGlobalLag]]. */
  def withGlobalLead(df: DataFrame, out: String, value: Column, n: Int,
      default: Column, sort: Seq[Column], nPart: Int = 0): DataFrame =
    withGlobalOffset(df, out, value, n, default, sort, nPart)

  private def withGlobalOffset(df: DataFrame, out: String, value: Column,
      offset: Int, default: Column, sort: Seq[Column], nPart: Int): DataFrame = {
    if (offset == 0) return df.withColumn(out, value)
    val k = math.abs(offset)
    def merged(loc: Column, inRange: Column): Column =
      when(inRange, loc).otherwise(default)
    def stockWin(w: org.apache.spark.sql.expressions.WindowSpec)
        : (Column, Column, Column) = {
      val loc = if (offset < 0) lag(value, k).over(w.orderBy(sort: _*))
        else lead(value, k).over(w.orderBy(sort: _*))
      val rn = row_number().over(w.orderBy(sort: _*)).cast("long")
      val cnt = count(lit(1)).over(w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
      (loc, rn, cnt)
    }
    if (!rankedSafe(df)) {
      val (loc, rn, cnt) = stockWin(Window.partitionBy())
      val inRange = if (offset < 0) rn > k else rn <= cnt - k
      return df.withColumn(out, merged(loc, inRange))
    }
    if (small(df)) {
      val base = df.withColumn(SMALL, smallKey(df))
      val (loc, rn, cnt) = stockWin(Window.partitionBy(col(SMALL)))
      val inRange = if (offset < 0) rn > k else rn <= cnt - k
      return base.withColumn(out, merged(loc, inRange)).drop(SMALL)
    }
    val p = parted(df, sort, nPart)
    val w = Window.partitionBy(col(PID)).orderBy(sort: _*)
    val base = p
      .withColumn("__rk_loc",
        if (offset < 0) lag(value, k).over(w) else lead(value, k).over(w))
      .withColumn("__rk_j", row_number().over(w).cast("long"))
    // per-pid counts + exclusive prefix: global position and tail index
    val offs = p.groupBy(col(PID)).agg(count(lit(1)).as("__rk_n"))
      .withColumn("__rk_off", coalesce(
        exclusivePrefix(sum)(col("__rk_n")), lit(0L)))
      .select(col(PID), col("__rk_n"), col("__rk_off"))
    val g = base.join(broadcast(offs), Seq(PID))
      .withColumn("__rk_g", col("__rk_off") + col("__rk_j"))
      .withColumn("__rk_jd", col("__rk_n") - col("__rk_j") + 1L)
    // boundary rows as SUPPLIERS: each posts its value at the global
    // position it serves (g - offset); __rk_hit distinguishes a real NULL
    // value from a join miss (miss ⇔ the offset row does not exist)
    val fixes = g.filter(col("__rk_j") <= k || col("__rk_jd") <= k)
      .select((col("__rk_g") - offset).as("__rk_tg"),
        value.as("__rk_fv"), lit(true).as("__rk_hit"))
    val need =
      if (offset < 0) col("__rk_j") <= k else col("__rk_jd") <= k
    g.join(broadcast(fixes), col("__rk_g") === col("__rk_tg"), "left")
      .withColumn(out, when(need,
        when(col("__rk_hit").isNotNull, col("__rk_fv")).otherwise(default))
        .otherwise(col("__rk_loc")))
      .drop(PID, "__rk_loc", "__rk_j", "__rk_jd", "__rk_n", "__rk_off",
        "__rk_g", "__rk_tg", "__rk_fv", "__rk_hit")
  }

  /** MAX of `value` over all rows whose `orderKey` is STRICTLY smaller
    * (the `RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING` frame), as
    * `out` — NULL when no strictly-smaller row exists.
    *
    * Spelled on the DISTINCT-KEY table: the answer is a function of the
    * key alone, so per-key maxima reduce first (one map-side-combinable
    * hash shuffle over the corpus — the corpus itself never
    * range-shuffles), the unique-key table runs the prefix machinery
    * (unique keys cannot straddle a range boundary, so the [[paddedKeys]]
    * refinement is vacuous and strictness survives partition splits by
    * construction), and an equi-join folds the per-key answer back. */
  def withStrictPrecedingMax(df: DataFrame, out: String, value: Column,
      orderKey: Column, nPart: Int = 0): DataFrame = {
    if (!rankedSafe(df)) return df.withColumn(out,
      max(value).over(Window.orderBy(orderKey)
        .rangeBetween(Window.unboundedPreceding, -1)))
    if (small(df)) return df.withColumn(SMALL, smallKey(df))
      .withColumn(out, max(value).over(
        Window.partitionBy(col(SMALL)).orderBy(orderKey)
          .rangeBetween(Window.unboundedPreceding, -1)))
      .drop(SMALL)
    val keys = df.groupBy(orderKey.as("__rk_k")).agg(max(value).as("__rk_mx"))
    val p = parted(keys, Seq(col("__rk_k").asc), nPart)
    // keys are unique, so the ROWS frame equals the RANGE frame here
    val run = p.withColumn("__rk_in",
      max(col("__rk_mx")).over(Window.partitionBy(col(PID))
        .orderBy(col("__rk_k"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    val offs = offsets(p, max(col("__rk_mx")), exclusivePrefix(max))
    val sm = run.join(broadcast(offs), Seq(PID))
      .withColumn(out, greatest(col("__rk_in"), col("__rk_off")))
      .select(col("__rk_k"), col(out))
    df.join(sm, orderKey <=> col("__rk_k")).drop("__rk_k")
  }
}
