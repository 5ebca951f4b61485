package graft

import org.apache.spark.sql.DataFrame

/** Pins the plan shapes the r11 replans bought, so a regression diffs as
  * a red spec instead of a slow bench line:
  *
  *  - q_multiset_ops: ONE lineitem-sized key shuffle (multiplicity
  *    arithmetic) instead of exceptAll + intersectAll + countDistinct —
  *    at most 2 shuffle exchanges total (the second moves per-key counts).
  *  - dd_keep_best: the cluster map comes from the PERSISTED bucketed
  *    table, not a per-invocation shingle-join + connected-components
  *    rebuild — the plan must scan the cluster-map table and must NOT
  *    re-derive near-dup pairs (no shingle explode anywhere).
  */
class QueryPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    df.collect() // let AQE settle; inspect the final adaptive plan
    // the adaptive dump repeats every operator under "== Initial Plan ==" —
    // counting across both sections double-counts exchanges
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
  }

  private def shuffles(plan: String): Int =
    plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")

  test("q_multiset_ops plans as multiplicity arithmetic: <= 2 shuffles, " +
      "no exceptAll/intersectAll full-row exchanges, no Expand") {
    val plan = finalPlan(SparkEntry.queries("q_multiset_ops")(spark, dir))
    assert(shuffles(plan) <= 2, s"expected <=2 shuffle exchanges in:\n$plan")
    assert(!plan.contains("Expand"), s"countDistinct Expand crept back:\n$plan")
  }

  test("dd_keep_best reads the persisted cluster map — no shingle-join " +
      "rebuild in the plan") {
    val plan = finalPlan(SparkEntry.queries("dd_keep_best")(spark, dir))
    // the policy joins the bucketed cluster-map table...
    assert(plan.contains("graft_cluster_map_"),
      s"expected a cluster-map table scan in:\n$plan")
    // ...and never re-derives pairs: the ngramJaccard build explodes
    // shingle arrays, which plans as Generate — absent from a pure join
    assert(!plan.contains("Generate"),
      s"per-invocation pair rebuild crept back:\n$plan")
  }

  test("q_bitmap_distinct: exact distinct with NO Expand and map-side " +
      "mask combine (2 shuffles: bucket masks, then per-group popcounts)") {
    val plan = finalPlan(SparkEntry.queries("q_bitmap_distinct")(spark, dir))
    assert(!plan.contains("Expand"),
      s"countDistinct's Expand defeats the bitmap path:\n$plan")
    assert(shuffles(plan) <= 2, s"expected <=2 shuffles in:\n$plan")
  }

  test("q_pit_join rides the as-of machinery: ONE keyed shuffle, no " +
      "interval theta-join artifacts") {
    val plan = finalPlan(SparkEntry.queries("q_pit_join")(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.toLowerCase.contains("broadcastnestedloop"),
      s"interval containment degraded to a theta join:\n$plan")
    assert(shuffles(plan) == 1, s"expected exactly 1 shuffle in:\n$plan")
  }

  private def scanCount(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains("FileScan parquet") || l.contains("Scan parquet "))

  test("r14 statistics additions keep the one-corpus-scan discipline") {
    // the #417 rule: a stat face reads its source table EXACTLY once —
    // margin/expectation re-derivation must fold over the bounded cell
    // table, never re-scan the corpus
    for (q <- Seq("q_ttest_welch", "q_anova", "q_js_divergence",
        "q_prop_ztest", "q_rolling_slope", "q_key_skew")) {
      val plan = finalPlan(SparkEntry.queries(q)(spark, dir))
      assert(scanCount(plan) == 1, s"$q re-scans its source:\n$plan")
    }
  }

  test("q_link_predict takes top-k as TakeOrdered, never a global sort") {
    // sf0.01: the sf0.001 co-activity graph has no non-adjacent wedge
    // pairs, and AQE collapses an empty result to EmptyRelation — no
    // plan left to pin
    val plan = finalPlan(
      SparkEntry.queries("q_link_predict")(spark, "/root/testdata/sf0.01"))
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }
}
