package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** BNLJ budget pin (r13 VERDICT "Next round" #5): the broadcast-bounded
  * BNLJ faces are safe by CONSTRUCTION — a brute-force or ground-truth
  * scan whose broadcast side is a bounded probe set — but until now
  * nothing pinned the construction: a face edit could silently unbound a
  * broadcast side (drop the `vec_id < 8` anchor filter, say) and the plan
  * audit would still just report "BNLJ". This spec runs every BNLJ face
  * and asserts the ACTUAL broadcast row count (the exchange's
  * numOutputRows metric after execution) stays within the face's
  * documented budget — the DedupAdversarialSpec treatment applied to the
  * ANN/ground-truth family. Faces whose audit shows no BNLJ are pinned by
  * AUDIT itself; faces here may legitimately plan ZERO BNLJs at this
  * fixture size (AQE may pick a hash join) — the assertion is only that
  * any BNLJ present is fed by a bounded broadcast.
  */
class BnljBudgetSpec extends SparkSpec {

  /** Per-face broadcast budgets at sf0.001 (embeddings = 500 rows).
    *  - probe-bounded faces broadcast the `vec_id < 8` anchor set, its
    *    metadata join, or the k-bounded probe/table fan-out: far under 100;
    *  - the two exact ground-truth check faces (semdedup / embed_neardup)
    *    broadcast one full side of the O(n²) pair scan BY DESIGN — the
    *    documented check-size-only posture; their budget is the corpus
    *    count with headroom, and the scale path they certify never runs
    *    this plan (banded/bucketed joins). */
  private val budgets: Map[String, Long] = Map(
    "sim_topk_bruteforce" -> 100L,
    "sim_topk_pq" -> 100L,
    "pipeline_hard_negatives" -> 100L,
    "pipeline_contrastive" -> 100L,
    "sim_topk_lsh_check" -> 100L,
    "sim_topk_ivf_check" -> 100L,
    "sim_topk_pq_check" -> 100L,
    "sim_topk_ivfpq_check" -> 100L,
    "sim_topk_ivf_indexed_check" -> 100L,
    "sim_topk_ivfpq_indexed_check" -> 100L,
    "sim_topk_ivf_drift_check" -> 100L,
    // r14 additions to the family — same probe-bounded construction
    "pipeline_hard_negatives_ivf_check" -> 100L,
    "st_sim_topk_indexed_check" -> 100L,
    "sim_topk_ivf_forgotten_check" -> 100L,
    "dd_semdedup_check" -> 700L,
    "dd_embed_neardup_check" -> 700L)

  /** Full recursive walk, crossing AQE stage boundaries (QueryStageExec
    * and AdaptiveSparkPlanExec hide their subtrees from `children`). */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val more = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case r: ReusedExchangeExec => walk(r.child)
      case _ => Nil
    }
    p +: (p.children.flatMap(walk) ++ more)
  }

  /** numOutputRows of every broadcast exchange feeding a BNLJ. */
  private def bnljBroadcastRows(plan: SparkPlan): Seq[Long] =
    walk(plan).collect { case j: BroadcastNestedLoopJoinExec => j }
      .map { j =>
        val side = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _ => j.right
        }
        val ex = walk(side).collectFirst {
          case b: BroadcastExchangeExec => b
        }
        assert(ex.isDefined, s"BNLJ without a broadcast exchange:\n$j")
        ex.get.metrics("numOutputRows").value
      }

  budgets.toSeq.sortBy(_._1).foreach { case (name, budget) =>
    test(s"$name: every BNLJ broadcast side stays within $budget rows") {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize the adaptive plan + populate metrics
      val rows = bnljBroadcastRows(df.queryExecution.executedPlan)
      rows.foreach { n =>
        assert(n <= budget,
          s"$name broadcasts $n rows into a nested-loop join " +
            s"(budget $budget) — a probe bound has been lost")
      }
    }
  }

  test("the index-backed miner (the BNLJ family's scale path) plans ZERO " +
      "nested-loop joins even with anchors = corpus") {
    val df = SparkEntry.queries("pipeline_hard_negatives_ivf")(spark, sf)
    df.collect()
    assert(bnljBroadcastRows(df.queryExecution.executedPlan).isEmpty,
      "pipeline_hard_negatives_ivf must never nested-loop")
  }
}
