package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Sum}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Catalyst optimizer rule: rewrite the unpartitioned-window family —
  * `row_number() OVER (ORDER BY ...)` and running `sum/count/min/max
  * ... ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW` — into the
  * distributed-prefix plan [[graft.operators.Ranked]] spells by hand
  * (range-repartition on the sort, per-partition locals keyed on
  * `spark_partition_id()`, an nPart-row exclusive-prefix of per-partition
  * totals broadcast back; prefixes combine via Sum for ranks/sums/counts
  * and Min/Max for the extrema), and the RANK family —
  * `rank`/`dense_rank`/`percent_rank`/`cume_dist` — into the DISTINCT-KEY
  * decomposition ([[rewriteRank]]): per-key counts reduce first, the
  * unique-key table runs the same prefix machinery, a null-safe equi-join
  * folds the per-key answer back. The user writes the natural window
  * query; the plan that runs never sorts corpus-proportional rows in one
  * task. (A window MIXING the two families — e.g. `rank` and
  * `row_number` over one spec — keeps the stock plan: the two plan
  * shapes don't compose in a single rewrite.)
  *
  * Deliberately NARROW (the optimizer-rule safety posture):
  *  - only windows whose every expression is `row_number()` with the
  *    default frame, or a non-DISTINCT unfiltered running
  *    sum/count/min/max over the explicit ROWS unbounded→current frame,
  *    on the window's own ORDER BY. RANGE frames (the default when only
  *    ORDER BY is written) are NOT rewritten: they include later-ordered
  *    tie PEERS, which the exchange-identity pad may split across
  *    partitions;
  *  - only DETERMINISTIC sort keys (a nondeterministic key can't be
  *    range-partitioned reproducibly);
  *  - inputs already aggregate-, global-limit- or WindowGroupLimit-guarded
  *    are left alone — group-sized / k-bounded rows don't need the
  *    machinery (and this is also what makes the rule a fixed point: its
  *    own offsets window sits above an Aggregate and is never re-matched);
  *  - windows feeding a small `rn <= k` rank-limit filter are left alone —
  *    Spark's InferWindowGroupLimit serves the top-k idiom far cheaper
  *    than a full range shuffle, and it must see the stock shape;
  *  - the whole rule BAILS OUT when `spark.sql.exchange.reuse` is
  *    false: partition-id agreement between the ranked branch and the
  *    counts branch rests on physical ReuseExchange deduplicating the two
  *    identical range exchanges — without reuse the two RangePartitioners
  *    sample split points independently and may disagree.
  * Everything else keeps Spark's stock plan. Equality with the stock
  * plan is spec-pinned on tie-heavy data
  * ([[graft.plans.GlobalRowNumberRewriteSpec]]); the replacement emits the
  * ORIGINAL output attribute ids, so downstream references are
  * untouched.
  *
  * Wired two ways: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (deploy-time, every session) or
  * `spark.experimental.extraOptimizations :+= GlobalRowNumberRewrite`
  * (runtime, one session). Disable per session with
  * `spark.graft.rewriteGlobalRowNumber=false`.
  */
object GlobalRowNumberRewrite extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  val ConfKey = "spark.graft.rewriteGlobalRowNumber"

  /** Rank-limit filters with k at or below this keep the stock plan (the
    * InferWindowGroupLimit top-k regime). */
  val TopKKey = "spark.graft.rewriteGlobalRowNumber.topKThreshold"

  /** Rows entering this subtree are group-sized or k-bounded on every
    * path — the logical twin of tools.PlanChecks' physical guard. */
  private def guarded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _: GlobalLimit => true
    case _: WindowGroupLimit => true
    case _ if p.children.isEmpty => false
    case _ => p.children.forall(guarded)
  }

  private def smallLit(e: Expression, cap: Long): Boolean = e match {
    case Literal(v, ByteType | ShortType | IntegerType | LongType)
        if v != null =>
      String.valueOf(v).toLong <= cap
    case _ => false
  }

  /** ExprIds bounded above by a small integer literal in ANY Filter of the
    * plan — a window whose row_number output lands here is the top-k idiom
    * (`WHERE rn <= k`), which InferWindowGroupLimit handles cheaper than a
    * full range shuffle. Collected by exprId (not node identity) so the
    * check survives transformUp's child-copy rebuilds. */
  private def rankLimitedIds(plan: LogicalPlan, cap: Long): Set[ExprId] = {
    val b = Set.newBuilder[ExprId]
    plan.foreach {
      case Filter(cond, _) =>
        splitConjunctivePredicates(cond).foreach {
          case LessThanOrEqual(a: Attribute, l) if smallLit(l, cap) => b += a.exprId
          case LessThan(a: Attribute, l) if smallLit(l, cap + 1) => b += a.exprId
          case EqualTo(a: Attribute, l) if smallLit(l, cap) => b += a.exprId
          case GreaterThanOrEqual(l, a: Attribute) if smallLit(l, cap) => b += a.exprId
          case GreaterThan(l, a: Attribute) if smallLit(l, cap + 1) => b += a.exprId
          case EqualTo(l, a: Attribute) if smallLit(l, cap) => b += a.exprId
          case _ =>
        }
      case _ =>
    }
    b.result()
  }

  private def isDefaultRowNumberFrame(f: WindowFrame): Boolean = f match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case _ => false
  }

  /** The analyzer materializes non-trivial sort expressions (e.g.
    * `ORDER BY rand()`) as aliases in the Project directly below the
    * window, so `orderSpec.deterministic` alone misses them — a sort key
    * fed by a nondeterministic alias there is nondeterministic too. */
  private def ndSortBelow(w: Window): Boolean = {
    val refs = AttributeSet(w.orderSpec.flatMap(_.references))
    w.child match {
      case Project(list, _) => list.exists {
        case a: Alias => refs.contains(a.toAttribute) && !a.child.deterministic
        case _ => false
      }
      case _ => false
    }
  }

  /** The supported global-window family: `row_number()` and running
    * `sum/count/min/max` over the ROWS `UNBOUNDED PRECEDING..CURRENT ROW`
    * frame. RANGE frames (the default when only ORDER BY is written) are
    * deliberately NOT rewritten: a RANGE frame includes the current row's
    * later-ordered PEERS, and the exchange-identity pad refines tie
    * order, so a tie group straddling a range boundary would lose its
    * cross-partition peers. avg and DISTINCT/FILTER aggregates keep the
    * stock plan too. */
  private def supportedExpr(w: Window)(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(fn, WindowSpecDefinition(Nil, os, f)), _)
        if os == w.orderSpec && isDefaultRowNumberFrame(f) =>
      fn match {
        case _: RowNumber => true
        case NTile(Literal(b: Int, IntegerType)) => b > 0
        case aggregate.AggregateExpression(af, _, false, None, _) =>
          af match {
            case _: Sum | _: Count | _: aggregate.Min | _: aggregate.Max =>
              true
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  private def isRowNumberExpr(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: RowNumber, _), _) => true
    case _ => false
  }

  /** The RANK family — `rank` / `dense_rank` / `percent_rank` /
    * `cume_dist`. These are functions of the sort KEY alone (peers share
    * the answer), which is both why the pid-prefix machinery of
    * [[rewrite]] cannot serve them (the exchange-identity pad splits tie
    * groups across partitions, and a split tie group loses its peers'
    * contribution) and why the DISTINCT-KEY decomposition of
    * [[rewriteRank]] can: per-key counts reduce first, unique keys cannot
    * straddle a range boundary, and an equi-join folds the per-key answer
    * back. Each must carry the function's own analyzer-assigned frame. */
  private def supportedRankExpr(w: Window)(e: NamedExpression): Boolean =
    e match {
      case Alias(WindowExpression(fn: WindowFunction,
          WindowSpecDefinition(Nil, os, f)), _)
          if os == w.orderSpec && f == fn.frame =>
        fn match {
          case _: Rank | _: DenseRank | _: PercentRank | _: CumeDist => true
          case _ => false
        }
      case _ => false
    }

  /** rank()/dense_rank() feeding a small `<= k` filter is the same
    * WindowGroupLimit top-k idiom as row_number (InferWindowGroupLimit
    * serves all three); percent_rank/cume_dist emit doubles and never
    * form it. */
  private def isRankTopKExpr(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: Rank | _: DenseRank, _), _) => true
    case _ => false
  }

  /** Whole-input frames: `agg(x) OVER ()` (and the explicit
    * `ROWS/RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING`
    * spellings, with or without ORDER BY — the frame covers every row, so
    * order is irrelevant). The share-of-total idiom `x / sum(x) OVER ()`
    * is the most common global-window scale cliff of all: stock Spark
    * moves the whole corpus to one task to evaluate a single number. */
  private def wholeFrame(f: WindowFrame): Boolean = f match {
    case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) =>
      true
    case _ => false
  }

  /** Order-independent aggregates only: first/last/collect change with
    * tie order; sum/count/min/max/avg. (The analyzer rejects DISTINCT
    * window functions outright, and FILTER forms carry verbatim into a
    * scalar Aggregate, so the permissive match on those flags is safe.) */
  private def supportedGlobalAggExpr(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(
        aggregate.AggregateExpression(af, _, _, _, _),
        WindowSpecDefinition(Nil, _, f)), _) if wholeFrame(f) =>
      af match {
        case _: Sum | _: Count | _: aggregate.Min | _: aggregate.Max |
            _: aggregate.Average => af.deterministic
        case _ => false
      }
    case _ => false
  }

  /** rewriteGlobalAgg/rewriteRank execute `w.child` as TWO independent
    * subtrees (aggregate/key branch vs probe branch) with no shared
    * exchange — unlike [[rewrite]], whose branches dedupe through one
    * ReuseExchange. A nondeterministic child (e.g. a rand()-based sample
    * filter) would evaluate differently per branch, so the scalar/rank
    * values would silently disagree with the rows they annotate. Those
    * two rewrites therefore require the ENTIRE child subtree
    * deterministic (Expression.deterministic already folds in its own
    * children, so the per-node expression check covers every leaf). */
  private def deterministicSubtree(p: LogicalPlan): Boolean =
    !p.exists(_.expressions.exists(!_.deterministic))

  private def rewritableGlobalAgg(w: Window): Boolean =
    w.partitionSpec.isEmpty && w.windowExpressions.nonEmpty &&
      w.windowExpressions.forall(supportedGlobalAggExpr) &&
      !guarded(w.child) && deterministicSubtree(w.child)

  private def rewritableRank(w: Window, limited: Set[ExprId]): Boolean =
    w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
      w.orderSpec.forall(_.child.deterministic) && !ndSortBelow(w) &&
      w.windowExpressions.nonEmpty &&
      w.windowExpressions.forall(supportedRankExpr(w)) &&
      !guarded(w.child) && deterministicSubtree(w.child) &&
      !w.windowExpressions.exists(e =>
        limited.contains(e.exprId) && isRankTopKExpr(e))

  private def rewritable(w: Window, limited: Set[ExprId]): Boolean =
    w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
      w.orderSpec.forall(_.child.deterministic) && !ndSortBelow(w) &&
      // every child column rides the padded range keys (exchange-identity
      // pin, see rewrite()) — all must be orderable
      w.child.output.forall(a => RowOrdering.isOrderable(a.dataType)) &&
      w.windowExpressions.forall(supportedExpr(w)) &&
      !guarded(w.child) &&
      // the top-k idiom guard applies to rank outputs only — a filtered
      // running SUM is not a WindowGroupLimit shape
      !w.windowExpressions.exists(e =>
        limited.contains(e.exprId) && isRowNumberExpr(e))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    // pid agreement between the two branches rests on ReuseExchange
    if (!conf.exchangeReuseEnabled) return plan
    val cap = conf.getConfString(TopKKey, "1000").toLong
    // the Ranked size gate (shared knob): inputs estimated at or under
    // the threshold sort fine in one task — keep the stock plan
    val smallBytes = BigInt(conf.getConfString(
      graft.operators.Ranked.SmallBytesKey, (8L << 20).toString).toLong)
    lazy val limited = rankLimitedIds(plan, cap)
    plan.transformUp {
      case w: Window if rewritable(w, limited) &&
          w.child.stats.sizeInBytes > smallBytes => rewrite(w)
      case w: Window if rewritableRank(w, limited) &&
          w.child.stats.sizeInBytes > smallBytes => rewriteRank(w)
      case w: Window if rewritableGlobalAgg(w) &&
          w.child.stats.sizeInBytes > smallBytes => rewriteGlobalAgg(w)
    }
  }

  /** `agg(x) OVER (whole-input frame)` → a 1-row scalar Aggregate
    * broadcast back over a cross join. The aggregate expressions move
    * VERBATIM (distinct/FILTER included); the single broadcast row makes
    * the nested-loop join a constant-cost map pass. The input computes
    * twice (once under the Aggregate, once as the join probe) — the trade
    * for never moving corpus-proportional rows into one task. Empty input
    * stays empty (inner join against the 1-row aggregate). */
  private def rewriteGlobalAgg(w: Window): LogicalPlan = {
    val aggAliases = w.windowExpressions.zipWithIndex.map { case (a: Alias, i) =>
      Alias(a.child.asInstanceOf[WindowExpression].windowFunction,
        s"__graft_ga$i")()
    }
    val agg = Aggregate(Nil, aggAliases, w.child)
    val joined = Join(w.child, agg, Cross, None,
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
    val outExprs = w.windowExpressions.zip(aggAliases).map {
      case (a: Alias, v) =>
        Alias(v.toAttribute, a.name)(exprId = a.exprId,
          qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
    }
    Project(w.child.output ++ outExprs, joined)
  }

  private def rewrite(w: Window): LogicalPlan = {
    val nPart = conf.numShufflePartitions
    // range-repartition on the window's own sort PADDED with every other
    // child column (ascending): partition-id agreement between the ranked
    // branch and the counts branch rests on the two range exchanges
    // canonicalizing EQUAL, and ColumnPruning would otherwise narrow the
    // counts branch below its exchange (it only needs the pid) — the pad
    // makes every column a key of the exchange itself, so no projection
    // can slip below it in either branch. The pad only refines tie order,
    // which row_number leaves unspecified anyway.
    val sortedRefs = AttributeSet(w.orderSpec.flatMap(_.references))
    val padded = w.orderSpec ++ w.child.output.collect {
      case a if !sortedRefs.contains(a) => SortOrder(a, Ascending)
    }
    // the pid projects ABOVE the exchange (nondeterministic — Catalyst
    // cannot move it through)
    val ranged = RepartitionByExpression(padded, w.child, Some(nPart))
    val pidAlias = Alias(SparkPartitionID(), "__graft_pid")()
    val proj = Project(w.child.output :+ pidAlias, ranged)
    val pid = pidAlias.toAttribute

    val rowsFrame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    def freshAgg(af: aggregate.AggregateFunction) =
      aggregate.AggregateExpression(af, aggregate.Complete,
        isDistinct = false, filter = None, NamedExpression.newExprId)

    // per-expression decomposition: the LOCAL per-pid window function, the
    // per-partition TOTAL for the offsets branch, the prefix combiner over
    // totals, and the merge of (offset, local) into the global answer
    val exprs = w.windowExpressions.zipWithIndex.map { case (a: Alias, i) =>
      val fn = a.child.asInstanceOf[WindowExpression].windowFunction
      val (localFn, totalFn) = fn match {
        case _: RowNumber | _: NTile =>
          // ntile derives from the GLOBAL rank plus the total row count
          (RowNumber(): Expression, freshAgg(Count(Seq(Literal(1)))))
        case ae: aggregate.AggregateExpression =>
          (freshAgg(ae.aggregateFunction): Expression,
            freshAgg(ae.aggregateFunction))
      }
      (a, i, fn, localFn, totalFn)
    }

    // per-partition locals: the SAME window functions, now keyed on pid
    val locAliases = exprs.map { case (_, i, _, localFn, _) =>
      Alias(WindowExpression(localFn,
        WindowSpecDefinition(Seq(pid), w.orderSpec, rowsFrame)),
        s"__graft_loc$i")()
    }
    val win = Window(locAliases, Seq(pid), w.orderSpec, proj)

    // nPart-row per-partition totals; reads the SAME proj subtree, so the
    // physical planner reuses one range exchange (partition-id agreement)
    val pidKeyAlias = Alias(pid, "__graft_pidk")()
    val totAliases = exprs.map { case (_, i, _, _, totalFn) =>
      Alias(totalFn, s"__graft_t$i")()
    }
    val agg = Aggregate(Seq(pid), pidKeyAlias +: totAliases, proj)
    val pidK = pidKeyAlias.toAttribute

    // exclusive prefixes over the tiny totals table (aggregate-guarded —
    // exempt from this rule and from the GLOBALWINDOW audit flag alike);
    // sums/counts prefix via Sum, min/max via Min/Max
    val offAliases = exprs.map { case (_, i, fn, _, _) =>
      val tot = totAliases(i).toAttribute
      val prefixFn = fn match {
        case aggregate.AggregateExpression(_: aggregate.Min, _, _, _, _) =>
          freshAgg(aggregate.Min(tot))
        case aggregate.AggregateExpression(_: aggregate.Max, _, _, _, _) =>
          freshAgg(aggregate.Max(tot))
        case _ => freshAgg(Sum(tot))
      }
      Alias(WindowExpression(prefixFn,
        WindowSpecDefinition(Nil, Seq(SortOrder(pidK, Ascending)),
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1)))),
        s"__graft_off$i")()
    }
    // ntile additionally needs the GLOBAL row count: one more windowed
    // aggregate over the same nPart-row totals table, framed
    // unbounded→unbounded (shared by every ntile in the window)
    val totAliasOpt = exprs.collectFirst {
      case (_, i, _: NTile, _, _) =>
        Alias(WindowExpression(freshAgg(Sum(totAliases(i).toAttribute)),
          WindowSpecDefinition(Nil, Seq(SortOrder(pidK, Ascending)),
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              UnboundedFollowing))),
          "__graft_tot")()
    }
    val offWin = Window(offAliases ++ totAliasOpt, Nil,
      Seq(SortOrder(pidK, Ascending)), agg)
    val offs = Project(pidKeyAlias.toAttribute +:
      (offAliases.map(_.toAttribute) ++ totAliasOpt.map(_.toAttribute)),
      offWin)

    val joined = Join(win, offs, Inner, Some(EqualTo(pid, pidK)),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))

    // global answer = prefix ⊕ local, emitted under the ORIGINAL attribute
    // ids (downstream references must not notice the rewrite)
    val outExprs = exprs.map { case (a, i, fn, _, _) =>
      val loc = locAliases(i).toAttribute
      val off = offAliases(i).toAttribute
      val merged: Expression = fn match {
        case _: RowNumber =>
          // rank = prefix row count + local rank (IntegerType, as stock)
          Cast(Add(Coalesce(Seq(off, Literal(0L))), Cast(loc, LongType)),
            IntegerType)
        case NTile(Literal(b: Int, IntegerType)) =>
          // Spark's ntile: q = cnt div n, r = cnt mod n; the first r
          // buckets hold q+1 rows. All-long arithmetic from the global
          // rank; If is lazily evaluated, so the q=0 (cnt < n) case never
          // divides by zero — every rank lands in the first branch there
          val rnG = Add(Coalesce(Seq(off, Literal(0L))), Cast(loc, LongType))
          val tot = totAliasOpt.get.toAttribute
          val n = Literal(b.toLong)
          val q = IntegralDivide(tot, n)
          val r = Pmod(tot, n)
          val big = Add(q, Literal(1L))
          val threshold = Multiply(r, big)
          Cast(If(LessThanOrEqual(rnG, threshold),
            Add(IntegralDivide(Subtract(rnG, Literal(1L)), big), Literal(1L)),
            Add(Add(r, IntegralDivide(
              Subtract(Subtract(rnG, threshold), Literal(1L)), q)),
              Literal(1L))), IntegerType)
        case aggregate.AggregateExpression(_: Count, _, _, _, _) =>
          Add(Coalesce(Seq(off, Literal(0L))), loc)
        case aggregate.AggregateExpression(_: aggregate.Min, _, _, _, _) =>
          Least(Seq(off, loc)) // skips NULLs, NULL iff both — min semantics
        case aggregate.AggregateExpression(_: aggregate.Max, _, _, _, _) =>
          Greatest(Seq(off, loc))
        case aggregate.AggregateExpression(_: Sum, _, _, _, _) =>
          // running sum: NULL prefix (first partition / all-null) keeps
          // the local value and vice versa; the Add is cast back to the
          // stock Sum's result type (decimal prefix totals widen)
          val offC = Cast(off, a.dataType)
          If(IsNull(offC), loc,
            If(IsNull(loc), offC, Cast(Add(offC, loc), a.dataType)))
      }
      Alias(merged, a.name)(exprId = a.exprId, qualifier = a.qualifier,
        explicitMetadata = Some(a.metadata))
    }
    Project(w.child.output ++ outExprs, joined)
  }

  /** The rank family via the DISTINCT-KEY decomposition (the
    * `Ranked.withStrictPrecedingMax` shape): rank/dense_rank/percent_rank/
    * cume_dist are functions of the sort key alone, so
    *   1. per-key row counts reduce first — ONE map-side-combinable hash
    *      shuffle; the corpus itself never range-shuffles;
    *   2. the unique-key table runs the pid-prefix machinery (unique keys
    *      cannot straddle a range boundary, so peers never split — the
    *      property the pid path cannot offer under the exchange-identity
    *      pad), producing per-key rank (exclusive row prefix + 1),
    *      dense rank (key prefix count), and the global total for the
    *      ratio forms;
    *   3. a null-safe equi-join on the sort keys folds the per-key answer
    *      back onto the corpus (AQE broadcasts the key table when small).
    * The ratio forms replicate the stock evaluateExpression arithmetic
    * exactly — percent_rank = (rank-1)/(N-1) guarded by N>1, cume_dist =
    * rows≤key / N, both as double divisions of longs — so results are
    * bit-identical, not merely close. */
  private def rewriteRank(w: Window): LogicalPlan = {
    val nPart = conf.numShufflePartitions
    val os = w.orderSpec
    def freshAgg(af: aggregate.AggregateFunction) =
      aggregate.AggregateExpression(af, aggregate.Complete,
        isDistinct = false, filter = None, NamedExpression.newExprId)

    // 1. distinct-key counts (duplicate sort expressions dedup via the
    // grouping key list; aliases keep one attribute per sort position)
    val keyAliases = os.zipWithIndex.map { case (so, i) =>
      Alias(so.child, s"__graft_k$i")()
    }
    val cntAlias = Alias(freshAgg(Count(Seq(Literal(1)))), "__graft_kc")()
    val keys = Aggregate(os.map(_.child), keyAliases :+ cntAlias, w.child)
    val kAttrs = keyAliases.map(_.toAttribute)
    val cnt = cntAlias.toAttribute

    // 2. range-partition the unique keys in the caller's own order
    // (direction AND null ordering preserved); cnt rides the keys as the
    // exchange-identity pad so ColumnPruning cannot narrow either branch
    // below the shared exchange. Keys are unique, so the pad is vacuous
    // for ordering semantics.
    val keySort = kAttrs.zip(os).map { case (a, so) =>
      SortOrder(a, so.direction, so.nullOrdering, Seq.empty)
    }
    val ranged = RepartitionByExpression(
      keySort :+ SortOrder(cnt, Ascending), keys, Some(nPart))
    val pidAlias = Alias(SparkPartitionID(), "__graft_pid")()
    val proj = Project(keys.output :+ pidAlias, ranged)
    val pid = pidAlias.toAttribute

    val rowsFrame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    // per-pid locals over the unique-key table: local key index (dense)
    // and INCLUSIVE running row count (rank/ratio forms)
    val locRn = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(Seq(pid), keySort, rowsFrame)), "__graft_lrn")()
    val locSum = Alias(WindowExpression(freshAgg(Sum(cnt)),
      WindowSpecDefinition(Seq(pid), keySort, rowsFrame)), "__graft_lsum")()
    val win = Window(Seq(locRn, locSum), Seq(pid), keySort, proj)

    // offsets branch: per-pid key count + row count off the SAME proj
    // subtree (one reused range exchange), exclusive prefixes plus the
    // grand row total over the nPart-row table
    val pidKeyAlias = Alias(pid, "__graft_pidk")()
    val tnAlias = Alias(freshAgg(Count(Seq(Literal(1)))), "__graft_tn")()
    val tsAlias = Alias(freshAgg(Sum(cnt)), "__graft_ts")()
    val agg = Aggregate(Seq(pid), Seq(pidKeyAlias, tnAlias, tsAlias), proj)
    val pidK = pidKeyAlias.toAttribute
    val exclFrame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1))
    val fullFrame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
    def offWinExpr(src: Attribute, f: WindowFrame, name: String) =
      Alias(WindowExpression(freshAgg(Sum(src)),
        WindowSpecDefinition(Nil, Seq(SortOrder(pidK, Ascending)), f)),
        name)()
    val offNAlias = offWinExpr(tnAlias.toAttribute, exclFrame, "__graft_offn")
    val offSAlias = offWinExpr(tsAlias.toAttribute, exclFrame, "__graft_offs")
    val totAlias = offWinExpr(tsAlias.toAttribute, fullFrame, "__graft_tot")
    val offWin = Window(Seq(offNAlias, offSAlias, totAlias), Nil,
      Seq(SortOrder(pidK, Ascending)), agg)
    val offs = Project(Seq(pidK, offNAlias.toAttribute,
      offSAlias.toAttribute, totAlias.toAttribute), offWin)

    val pidJoin = Join(win, offs, Inner, Some(EqualTo(pid, pidK)),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))

    // per-key answers (all-long arithmetic; ratio forms divide as double
    // exactly like the stock evaluateExpression)
    val offN = Coalesce(Seq(offNAlias.toAttribute, Literal(0L)))
    val offS = Coalesce(Seq(offSAlias.toAttribute, Literal(0L)))
    val rowsLe = Add(offS, locSum.toAttribute) // rows with key <= current
    val rankL = Add(Subtract(rowsLe, cnt), Literal(1L))
    val total = totAlias.toAttribute
    val dbl = org.apache.spark.sql.types.DoubleType
    val valAliases = w.windowExpressions.zipWithIndex.map { case (a: Alias, i) =>
      val merged: Expression =
        a.child.asInstanceOf[WindowExpression].windowFunction match {
          case _: Rank => Cast(rankL, IntegerType)
          case _: DenseRank =>
            Cast(Add(offN, Cast(locRn.toAttribute, LongType)), IntegerType)
          case _: PercentRank =>
            If(GreaterThan(total, Literal(1L)),
              Divide(Cast(Subtract(rankL, Literal(1L)), dbl),
                Cast(Subtract(total, Literal(1L)), dbl)),
              Literal(0.0d))
          case _: CumeDist =>
            Divide(Cast(rowsLe, dbl), Cast(total, dbl))
        }
      Alias(merged, s"__graft_v$i")()
    }
    val keyResult = Project(kAttrs ++ valAliases, pidJoin)

    // 3. fold back: null-safe equi-join on the sort keys (NULL keys are
    // ordering peers and grouped peers alike)
    val cond = kAttrs.zip(os).map { case (ka, so) =>
      EqualNullSafe(so.child, ka): Expression
    }.reduce(And(_, _))
    val back = Join(w.child, keyResult, Inner, Some(cond), JoinHint(None, None))
    val outExprs = w.windowExpressions.zip(valAliases).map {
      case (a: Alias, v) =>
        Alias(v.toAttribute, a.name)(exprId = a.exprId,
          qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
    }
    Project(w.child.output ++ outExprs, back)
  }
}
