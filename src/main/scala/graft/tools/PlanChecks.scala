package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Plan-shape predicates shared by the Audit tool and the plan specs. */
object PlanChecks {

  /** The FINAL physical plan (AQE-resolved if the df already ran). */
  def finalPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case other => other.children
  }

  /** True iff every scan-reaching path below `p` passes through an
    * aggregate or a GLOBAL limit — i.e. the rows entering an operator
    * above `p` are group-sized (vocabulary/partition-count) or k-bounded,
    * not corpus-proportional. LocalLimit alone does NOT guard (it bounds
    * per partition, not globally). */
  private def aggGuarded(p: SparkPlan): Boolean = {
    val n = p.getClass.getSimpleName
    if (n.contains("AggregateExec") || n.contains("GlobalLimit") ||
        n.contains("TakeOrderedAndProject") || n.contains("CollectLimit")) true
    else {
      val c = kids(p)
      c.nonEmpty && c.forall(aggGuarded)
    }
  }

  /** Count of UNPARTITIONED Window / WindowGroupLimit nodes sitting over
    * non-aggregate-guarded input — the single-task-sort smell that breaks
    * at 100 TB (r11 VERDICT #1: every global window must either ride the
    * Ranked distributed-prefix machinery or run over aggregate-sized
    * rows). */
  def globalWindowsOverRaw(p: SparkPlan): Int = {
    val here = p match {
      case w: WindowExec if w.partitionSpec.isEmpty && !aggGuarded(w.child) => 1
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty && !aggGuarded(w.child) => 1
      case _ => 0
    }
    here + kids(p).map(globalWindowsOverRaw).sum
  }
}
