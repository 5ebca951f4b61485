package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge lists — the family connected
  * components ([[Dedup.connectedComponents]]) opened, extended with a
  * DETERMINISTIC weighted PageRank: every quantity is an int64 at a fixed
  * scale and every division is an integral floor, so two engines (or two
  * runs under different partitionings) produce bit-identical ranks —
  * float PageRank cannot make that promise (summation order).
  */
object Graph {

  /** Integer-exact weighted PageRank with a FIXED iteration count (the
    * bounded-rounds posture of the CC family — at 100 TB you run k
    * power-iteration sweeps, not to-convergence):
    *
    *   rank_0(v)   = scale
    *   contrib(u→v) = (rank_i(u) · w(u,v)) div wdeg(u)
    *   rank_{i+1}(v) = (15·scale) div 100 + (85 · Σ_in contrib) div 100
    *
    * Classic 0.15/0.85 damping, all in int64 (bounds: ranks stay ≤
    * scale·|V|, so rank·w needs |V|·scale·max_w < 2⁶³ — document-scale
    * graphs at scale 10⁹ hold to max_w·|V| ≈ 9·10⁹). Dangling nodes (no
    * out-edges) leak their rank — the standard simplification; callers
    * who care add a sink edge. Per iteration: one edges⋈ranks join + one
    * dst-keyed aggregate — never an adjacency matrix.
    *
    * `edges`: (src, dst, w) with w a positive integer weight; multi-edges
    * allowed (weights add through wdeg and the contribution sum). */
  def pageRankInt(edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000L): DataFrame = {
    // edges (and the derived wdeg/nodes) are read EVERY iteration: persist
    // them once or the upstream edge aggregation recomputes k times (the
    // connectedComponents discipline — measured 2.6 s → sub-second on the
    // transition-graph face). Each sweep localCheckpoints so the plan stays
    // k-bounded instead of a k-deep join tree re-deriving from the source.
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wdeg = e.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
      val ew = e.join(wdeg, "src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var ranks = nodes.withColumn("rank", lit(scale))
      (1 to iters).foreach { _ =>
        val contrib = ew.join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("(rank * w) div wdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
        ranks = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(scale * 15L / 100L) +
              expr("(coalesce(in_sum, cast(0 as bigint)) * 85) div 100"))
              .as("rank"))
          .localCheckpoint(eager = true)
      }
      val out = ranks
      nodes.unpersist()
      ew.unpersist()
      out
    } finally { e.unpersist(); () }
  }
}
