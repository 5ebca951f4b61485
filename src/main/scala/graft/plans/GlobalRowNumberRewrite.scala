package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Catalyst optimizer rule: rewrite `row_number() OVER (ORDER BY ...)`
  * — the unpartitioned spelling every SQL user reaches for first — into
  * the distributed-prefix plan [[graft.operators.Ranked]] spells by hand
  * (range-repartition on the sort, per-partition ranks keyed on
  * `spark_partition_id()`, an nPart-row exclusive-prefix of counts
  * broadcast back). The user writes the natural window query; the plan
  * that runs never sorts corpus-proportional rows in one task.
  *
  * Deliberately NARROW (the optimizer-rule safety posture):
  *  - only windows whose every expression is a `row_number()` with the
  *    default frame and the window's own ORDER BY;
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

  private def rewritable(w: Window, limited: Set[ExprId]): Boolean =
    w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
      w.orderSpec.forall(_.child.deterministic) && !ndSortBelow(w) &&
      // every child column rides the padded range keys (exchange-identity
      // pin, see rewrite()) — all must be orderable
      w.child.output.forall(a => RowOrdering.isOrderable(a.dataType)) &&
      w.windowExpressions.forall {
        case Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(Nil, os, f)), _) =>
          os == w.orderSpec && isDefaultRowNumberFrame(f)
        case _ => false
      } && !guarded(w.child) &&
      !w.windowExpressions.exists(e => limited.contains(e.exprId))

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
    }
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

    // per-partition ranks: the SAME window function, now keyed on pid
    val rnAlias = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(Seq(pid), w.orderSpec,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
      "__graft_rn")()
    val win = Window(Seq(rnAlias), Seq(pid), w.orderSpec, proj)
    val rn = rnAlias.toAttribute

    // nPart-row per-partition counts; reads the SAME proj subtree, so the
    // physical planner reuses one range exchange (partition-id agreement)
    val pidKeyAlias = Alias(pid, "__graft_pidk")()
    val cntAlias = Alias(Count(Literal(1)).toAggregateExpression(), "__graft_c")()
    val agg = Aggregate(Seq(pid), Seq(pidKeyAlias, cntAlias), proj)
    val pidK = pidKeyAlias.toAttribute
    val cnt = cntAlias.toAttribute

    // exclusive prefix over the tiny counts table (aggregate-guarded —
    // exempt from this rule and from the GLOBALWINDOW audit flag alike)
    val offRawAlias = Alias(WindowExpression(
      Sum(cnt).toAggregateExpression(),
      WindowSpecDefinition(Nil, Seq(SortOrder(pidK, Ascending)),
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1)))),
      "__graft_offraw")()
    val offWin = Window(Seq(offRawAlias), Nil,
      Seq(SortOrder(pidK, Ascending)), agg)
    val offAlias = Alias(
      Coalesce(Seq(offRawAlias.toAttribute, Literal(0L))), "__graft_off")()
    val offs = Project(Seq(pidKeyAlias.toAttribute, offAlias), offWin)
    val off = offAlias.toAttribute

    val joined = Join(win, offs, Inner, Some(EqualTo(pid, pidK)),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))

    // global rank = prefix + local rank, emitted under the ORIGINAL
    // attribute ids (downstream references must not notice the rewrite)
    val outExprs = w.windowExpressions.map { case a: Alias =>
      Alias(Cast(Add(off, Cast(rn, LongType)), IntegerType), a.name)(
        exprId = a.exprId, qualifier = a.qualifier,
        explicitMetadata = Some(a.metadata))
    }
    Project(w.child.output ++ outExprs, joined)
  }
}
