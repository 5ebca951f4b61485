package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

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
  *  - inputs already aggregate- or global-limit-guarded are left alone —
  *    group-sized rows don't need the machinery (and this is also what
  *    makes the rule a fixed point: its own offsets window sits above an
  *    Aggregate and is never re-matched).
  * Everything else keeps Spark's stock plan. Equality with the stock
  * plan is spec-pinned on tie-heavy data; the replacement emits the
  * ORIGINAL output attribute ids, so downstream references are
  * untouched.
  *
  * Wired two ways: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (deploy-time, every session) or
  * `spark.experimental.extraOptimizations :+= GlobalRowNumberRewrite`
  * (runtime, one session). Disable per session with
  * `spark.graft.rewriteGlobalRowNumber=false`.
  */
object GlobalRowNumberRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewriteGlobalRowNumber"

  /** Rows entering this subtree are group-sized or k-bounded on every
    * path — the logical twin of tools.PlanChecks' physical guard. */
  private def guarded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _: GlobalLimit => true
    case _ if p.children.isEmpty => false
    case _ => p.children.forall(guarded)
  }

  private def isDefaultRowNumberFrame(f: WindowFrame): Boolean = f match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case _ => false
  }

  private def rewritable(w: Window): Boolean =
    w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
      w.orderSpec.forall(_.child.deterministic) &&
      w.windowExpressions.forall {
        case Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(Nil, os, f)), _) =>
          os == w.orderSpec && isDefaultRowNumberFrame(f)
        case _ => false
      } && !guarded(w.child)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transformUp {
      case w: Window if rewritable(w) => rewrite(w)
    }
  }

  private def rewrite(w: Window): LogicalPlan = {
    val nPart = conf.numShufflePartitions
    // range-repartition on the window's own sort; the pid projects ABOVE
    // the exchange (nondeterministic — Catalyst cannot move it through)
    val ranged = RepartitionByExpression(w.orderSpec, w.child, Some(nPart))
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
