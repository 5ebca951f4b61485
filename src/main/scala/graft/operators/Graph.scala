package graft.operators

import graft.functions.GraftFunctions.sum_dec_exact
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

  /** Size gate for the DRIVER-FINISHED small-graph paths (r17, opt guide
    * §1.2: fix the distributed algorithm first — and for a bounded-round
    * operator over a TINY graph the distributed algorithm is the wrong
    * one). Each superstep of the iterative operators below costs one
    * join + one aggregate + one eager localCheckpoint — 2-4 scheduled
    * jobs of pure fixed cost (measured: q_pagerank = 31 jobs / 777 tasks
    * / ~2 s steady-state at sf0.1 for a graph whose size is bounded by
    * (#event types)² at ANY corpus scale). When the materialized edge
    * list holds at most this many rows (an EXACT count of the persisted
    * frame, not an estimate), the same algorithm runs in one driver loop
    * over the collected edges: identical integer arithmetic (Java long
    * division == Spark `div` on non-negative int64), with strict
    * eligibility — any null key/weight, non-positive weight (pageRank /
    * sssp), unexpected column type, or arithmetic overflow falls back to
    * the distributed path, so the driver loop never has to replicate
    * null-join or overflow semantics (the r16 ADVICE divergence class).
    * GraphSmallEquivalenceSpec pins driver ≡ distributed bit-for-bit on
    * fuzzed graphs. Above the gate the distributed supersteps run
    * unchanged — at 100 TB a co-activity graph blows any driver budget
    * and a row-count gate cannot misfire. Default 500k edges ≈ tens of
    * MB of driver heap; 0 disables the driver path. */
  val SmallEdgesKey = "spark.graft.graph.smallEdges"

  private def smallEdgeLimit(df: DataFrame): Long =
    df.sparkSession.conf.get(SmallEdgesKey, "500000").toLong

  /** Exact-count gate: the frame is already persisted (the distributed
    * path would scan it repeatedly anyway); collect only when it fits. */
  private def collectIfSmall(e: DataFrame): Option[Array[org.apache.spark.sql.Row]] = {
    val lim = smallEdgeLimit(e)
    if (lim <= 0) None
    else if (e.count() <= lim) Some(e.collect())
    else None
  }

  private def isLong(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == org.apache.spark.sql.types.LongType

  private def rowsDF(spark: org.apache.spark.sql.SparkSession,
      rows: java.util.List[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(rows, schema)

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
      val nodeDt = e.schema(0).dataType
      val driver: Option[DataFrame] =
        if (nodeDt != e.schema(1).dataType || scale <= 0 ||
            !(isLong(nodeDt) || nodeDt == org.apache.spark.sql.types.StringType))
          None
        else collectIfSmall(e).flatMap(rows =>
          pageRankDriver(e, rows, iters, scale))
      driver.getOrElse(pageRankDistributed(e, iters, scale))
    } finally { e.unpersist(); () }
  }

  /** Driver finish under [[SmallEdgesKey]] — same integer arithmetic as
    * the supersteps (Java `/` on non-negative longs == Spark `div`);
    * bails (None) on any null key/weight, non-positive weight, or long
    * overflow, deferring those semantics to the distributed path. */
  private def pageRankDriver(e: DataFrame,
      rows: Array[org.apache.spark.sql.Row], iters: Int,
      scale: Long): Option[DataFrame] = {
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2) || r.getLong(2) <= 0L)
        return None
      i += 1
    }
    try {
      val nodes = scala.collection.mutable.LinkedHashSet.empty[Any]
      rows.foreach { r => nodes += r.get(0); nodes += r.get(1) }
      val wdeg = scala.collection.mutable.HashMap.empty[Any, Long]
      rows.foreach { r =>
        val k = r.get(0)
        wdeg.update(k, Math.addExact(wdeg.getOrElse(k, 0L), r.getLong(2)))
      }
      var rank = scala.collection.mutable.HashMap.empty[Any, Long]
      nodes.foreach(v => rank.update(v, scale))
      val base = scale * 15L / 100L
      for (_ <- 1 to iters) {
        val in = scala.collection.mutable.HashMap.empty[Any, Long]
        rows.foreach { r =>
          val s = r.get(0)
          val c = Math.multiplyExact(rank(s), r.getLong(2)) / wdeg(s)
          val d = r.get(1)
          in.update(d, Math.addExact(in.getOrElse(d, 0L), c))
        }
        val nr = scala.collection.mutable.HashMap.empty[Any, Long]
        nodes.foreach { v =>
          nr.update(v, base + Math.multiplyExact(in.getOrElse(v, 0L), 85L) / 100L)
        }
        rank = nr
      }
      val out = new java.util.ArrayList[org.apache.spark.sql.Row](nodes.size)
      nodes.foreach(v => out.add(org.apache.spark.sql.Row(v, rank(v))))
      val srcF = e.schema(0)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", srcF.dataType,
          srcF.nullable || e.schema(1).nullable),
        org.apache.spark.sql.types.StructField("rank",
          // the superstep's aggregate spelling is nullable once any
          // iteration runs; iters=0 is the non-null lit(scale)
          org.apache.spark.sql.types.LongType, nullable = iters >= 1)))
      Some(rowsDF(e.sparkSession, out, schema))
    } catch { case _: ArithmeticException => None }
  }

  private def pageRankDistributed(e: DataFrame, iters: Int,
      scale: Long): DataFrame = {
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
  }

  /** Bounded-round frontier BFS: shortest hop count from `source` over a
    * DIRECTED edge list (pass both directions for an undirected graph).
    * Returns (node, hops) for every node reachable within `maxHops`.
    *
    * The Pregel posture, not the transitive-closure one: each round is ONE
    * equi-join of the current frontier against the edges plus one anti-join
    * against the visited set — per-round work is frontier-degree-sized, the
    * visited set only ever grows by new nodes, and path multiplicity never
    * materializes (a recursive UNION ALL closure explodes exponentially on
    * dense graphs; the frontier dedups per round). Rounds stop early when a
    * frontier empties — the count driving that decision is a scalar, not
    * collected data. Hop distances are integers, so results are
    * deterministic under any partitioning.
    *
    * `edges`: (src, dst); `source`: 1+ seed rows with column `node`. */
  /** Bounded-round synchronous min-label propagation — community labels
    * after EXACTLY `rounds` supersteps (the bfsHops/ssspInt discipline: a
    * defined quantity on both engines whether or not the graph has
    * converged): l₀(v) = v, l_{k+1}(v) = min(l_k(v), min over neighbors
    * of l_k). Each round is one union + one min-aggregate — shuffles on
    * the node key only, labels are integers, so the result is
    * deterministic under any partitioning. `canonEdges`: (a, b), a < b. */
  def labelPropagate(canonEdges: DataFrame, rounds: Int): DataFrame = {
    val e = canonEdges.select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val driver: Option[DataFrame] =
        if (!e.schema.fields.forall(f => isLong(f.dataType))) None
        else collectIfSmall(e).flatMap(rows => labelPropagateDriver(e, rows, rounds))
      driver.getOrElse {
        var lab = e.select(col("a").as("v"))
          .union(e.select(col("b").as("v"))).distinct()
          .withColumn("l", col("v"))
          .localCheckpoint(eager = true)
        for (_ <- 1 to rounds) {
          lab = lab
            .union(e.join(lab, col("a") === col("v"))
              .select(col("b").as("v"), col("l")))
            .union(e.join(lab, col("b") === col("v"))
              .select(col("a").as("v"), col("l")))
            .groupBy(col("v")).agg(min(col("l")).as("l"))
            .localCheckpoint(eager = true)
        }
        lab
      }
    } finally e.unpersist()
  }

  /** Driver finish ([[SmallEdgesKey]]): per round each edge (a,b) offers
    * l(a) to b and l(b) to a, then every node keeps the min of its own
    * label and the offers — exactly the union + min-aggregate above.
    * Bails on any null endpoint. */
  private def labelPropagateDriver(e: DataFrame,
      rows: Array[org.apache.spark.sql.Row], rounds: Int): Option[DataFrame] = {
    var i = 0
    while (i < rows.length) {
      if (rows(i).isNullAt(0) || rows(i).isNullAt(1)) return None
      i += 1
    }
    val nodes = scala.collection.mutable.LinkedHashSet.empty[Long]
    rows.foreach { r => nodes += r.getLong(0); nodes += r.getLong(1) }
    var lab = scala.collection.mutable.HashMap.empty[Long, Long]
    nodes.foreach(v => lab.update(v, v))
    for (_ <- 1 to rounds) {
      val next = lab.clone()
      rows.foreach { r =>
        val a = r.getLong(0); val b = r.getLong(1)
        val la = lab(a); val lb = lab(b)
        if (la < next(b)) next.update(b, la)
        if (lb < next(a)) next.update(a, lb)
      }
      lab = next
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](nodes.size)
    nodes.foreach(v => out.add(org.apache.spark.sql.Row(v, lab(v))))
    val lt = org.apache.spark.sql.types.LongType
    val nullable = e.schema.fields.exists(_.nullable)
    Some(rowsDF(e.sparkSession, out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", lt, nullable),
        // min() is nullable once any round aggregates; rounds=0 keeps
        // the initial l = v spelling
        org.apache.spark.sql.types.StructField("l", lt,
          nullable || rounds >= 1)))))
  }

  def bfsHops(edges: DataFrame, source: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val srcDf = source.select(col("node"))
      val driver: Option[DataFrame] =
        if (!e.schema.fields.forall(f => isLong(f.dataType)) ||
            !isLong(srcDf.schema(0).dataType)) None
        else collectIfSmall(e).flatMap { rows =>
          // r17 ADVICE: bound the collect ITSELF — the edge gate says
          // nothing about the seed frame's size, so fetch at most lim+1
          // rows and route an over-limit seed set to the distributed path
          // before the driver has materialized it.
          val lim = smallEdgeLimit(e).min(Int.MaxValue - 1).toInt
          val src = srcDf.limit(lim + 1).collect()
          if (src.length > lim) None
          else bfsDriver(e, srcDf, rows, src, maxHops)
        }
      if (driver.isDefined) return driver.get
      var visited = source.select(col("node")).distinct()
        .withColumn("hops", lit(0)).localCheckpoint(eager = true)
      var frontier = visited
      var hop = 0
      var done = false
      while (hop < maxHops && !done) {
        hop += 1
        val next = frontier.join(e, col("node") === col("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited.select("node"), Seq("node"), "left_anti")
          .withColumn("hops", lit(hop))
          .localCheckpoint(eager = true)
        if (next.isEmpty) done = true
        else {
          visited = visited.unionByName(next).localCheckpoint(eager = true)
          frontier = next
        }
      }
      visited
    } finally { e.unpersist(); () }
  }

  /** Driver finish ([[SmallEdgesKey]]): identical frontier walk — per hop,
    * neighbors of the frontier minus visited join the visited set; stops
    * early on an empty frontier. Bails on any null node. */
  private def bfsDriver(e: DataFrame, srcDf: DataFrame,
      rows: Array[org.apache.spark.sql.Row],
      src: Array[org.apache.spark.sql.Row], maxHops: Int): Option[DataFrame] = {
    var i = 0
    while (i < rows.length) {
      if (rows(i).isNullAt(0) || rows(i).isNullAt(1)) return None
      i += 1
    }
    if (src.exists(_.isNullAt(0))) return None
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    rows.foreach { r =>
      adj.getOrElseUpdate(r.getLong(0),
        scala.collection.mutable.ArrayBuffer.empty[Long]) += r.getLong(1)
    }
    val visited = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
    src.foreach(r => visited.update(r.getLong(0), 0))
    var frontier: Iterable[Long] = visited.keys.toSeq
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      hop += 1
      val next = scala.collection.mutable.LinkedHashSet.empty[Long]
      frontier.foreach(n => adj.get(n).foreach(_.foreach { d =>
        if (!visited.contains(d)) next += d
      }))
      if (next.isEmpty) done = true
      else {
        next.foreach(n => visited.update(n, hop))
        frontier = next
      }
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](visited.size)
    visited.foreach { case (n, h) => out.add(org.apache.spark.sql.Row(n, h)) }
    val lt = org.apache.spark.sql.types.LongType
    val it = org.apache.spark.sql.types.IntegerType
    Some(rowsDF(e.sparkSession, out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", lt,
          srcDf.schema(0).nullable || e.schema.fields.exists(_.nullable)),
        org.apache.spark.sql.types.StructField("hops", it, nullable = false)))))
  }

  /** Bounded-round single-source shortest paths (Bellman-Ford sweeps) with
    * INTEGER edge weights: after k rounds every node holds the exact
    * minimum cost over paths of ≤ k edges — the same bounded-rounds
    * contract as [[pageRankInt]] (k sweeps, never to-convergence), so an
    * oracle replays it as k unrolled min-join CTEs and matches bit-for-bit
    * (min over int64 is partitioning-proof; float costs are not).
    *
    * Each sweep is ONE dist⋈edges equi-join plus one min-aggregate; the
    * dist table is node-sized, localCheckpointed per round so the plan
    * stays k-bounded. Negative weights are rejected (they make "shortest
    * within k hops" diverge from "shortest"). */
  def ssspInt(edges: DataFrame, source: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
      expr("CASE WHEN w < 0 THEN raise_error(" +
        "'ssspInt: negative edge weight - bounded-round minima would not " +
        "be shortest paths') ELSE cast(w as bigint) END").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val srcDf = source.select(col("node"))
      val driver: Option[DataFrame] =
        if (!isLong(e.schema(0).dataType) || !isLong(e.schema(1).dataType) ||
            !isLong(srcDf.schema(0).dataType)) None
        else collectIfSmall(e).flatMap { rows =>
          // bounded seed collect — same rationale as bfsHops above
          val lim = smallEdgeLimit(e).min(Int.MaxValue - 1).toInt
          val src = srcDf.limit(lim + 1).collect()
          if (src.length > lim) None
          else ssspDriver(e, srcDf, rows, src, rounds)
        }
      if (driver.isDefined) return driver.get
      var dist = source.select(col("node")).distinct()
        .withColumn("cost", lit(0L)).localCheckpoint(eager = true)
      (1 to rounds).foreach { _ =>
        val relaxed = dist.join(e, col("node") === col("src"))
          .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"))
        dist = dist.unionByName(relaxed)
          .groupBy(col("node")).agg(min(col("cost")).as("cost"))
          .localCheckpoint(eager = true)
      }
      dist
    } finally { e.unpersist(); () }
  }

  /** Driver finish ([[SmallEdgesKey]]): Bellman-Ford sweeps over the
    * collected edges — each round relaxes from the PREVIOUS round's dist
    * map, exactly like the union + min-aggregate. Negative weights never
    * reach here (the raise_error CASE fires during the gate's count);
    * null nodes/weights or cost overflow bail to the distributed path. */
  private def ssspDriver(e: DataFrame, srcDf: DataFrame,
      rows: Array[org.apache.spark.sql.Row],
      src: Array[org.apache.spark.sql.Row], rounds: Int): Option[DataFrame] = {
    var i = 0
    while (i < rows.length) {
      if (rows(i).isNullAt(0) || rows(i).isNullAt(1) || rows(i).isNullAt(2))
        return None
      i += 1
    }
    if (src.exists(_.isNullAt(0))) return None
    try {
      var dist = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
      src.foreach(r => dist.update(r.getLong(0), 0L))
      for (_ <- 1 to rounds) {
        val next = dist.clone()
        rows.foreach { r =>
          dist.get(r.getLong(0)).foreach { c =>
            val cand = Math.addExact(c, r.getLong(2))
            val d = r.getLong(1)
            if (!next.contains(d) || cand < next(d)) next.update(d, cand)
          }
        }
        dist = next
      }
      val out = new java.util.ArrayList[org.apache.spark.sql.Row](dist.size)
      dist.foreach { case (n, c) => out.add(org.apache.spark.sql.Row(n, c)) }
      val lt = org.apache.spark.sql.types.LongType
      Some(rowsDF(e.sparkSession, out,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", lt,
            srcDf.schema(0).nullable || e.schema.fields.take(2).exists(_.nullable)),
          org.apache.spark.sql.types.StructField("cost", lt,
            nullable = rounds >= 1)))))
    } catch { case _: ArithmeticException => None }
  }

  /** Exact triangle / wedge counts over an UNDIRECTED graph given as
    * canonical edges (a < b, deduplicated). One row:
    * (n_edges, n_wedges, n_triangles, n_closed = 3·triangles — the global
    * clustering numerator, all int64).
    *
    * Triangles enumerate through two hash joins on the canonical ordering
    * (a<b<c counts each triangle exactly once); wedges are Σ deg·(deg−1)/2
    * from one degree aggregate. At 100 TB the canonical orientation is the
    * standard skew bound (each edge stored once, high-degree hubs split
    * their wedge work across the b-side join); a production variant orients
    * by (degree, id) to cap it harder, which changes only the join keys,
    * not the counts. */
  def triangleStats(canonEdges: DataFrame): DataFrame = {
    // eager localCheckpoint, NOT persist-then-unpersist: the result is
    // returned lazily, so a finally-unpersist would release the cache
    // before any consumer executes and the edge derivation would recompute
    // for each of the four self-join/degree subtrees
    val e = canonEdges.select(col("a"), col("b")).localCheckpoint(eager = true)
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("deg"))
    // coalesce: on an empty edge set sum() is NULL, which would NULL the
    // derived __k and drop the single census row through the equi-join;
    // `div`, not `/` — Column `/` is double division, inexact past 2^53
    val wedges = deg.agg(
      coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L)).as("n_wedges"),
      coalesce(expr("sum(deg) div 2"), lit(0L)).cast("long").as("n_edges"))
    // 1-row ⋈ 1-row on a DERIVED key: a literal key would constant-fold
    // to `true` and degrade to a nested-loop join (the Audit flag).
    wedges.withColumn("__k", expr("pmod(n_wedges, 1)"))
      .join(broadcast(tri.withColumn("__k", expr("pmod(n_triangles, 1)"))),
        "__k")
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        (col("n_triangles") * 3L).as("n_closed"))
  }

  /** Bounded-round k-core peeling: repeatedly drop nodes of degree < k
    * (with the edges they carry) for a FIXED number of rounds — the same
    * bounded-iteration posture as [[ssspInt]]/[[pageRankInt]]: at 100 TB
    * you run R peels (each one degree-aggregate + two semi-join-shaped
    * edge filters, all equi-joins on node ids), not to-convergence, and
    * the oracle replays the SAME R rounds as unrolled CTEs so both
    * engines agree bit-for-bit. After R rounds the survivors are a
    * superset of the true k-core, equal once any round removes nothing
    * (most real graphs peel in a handful of rounds — the face's
    * co-activity graph is stable after 3). Per-round localCheckpoint
    * keeps the plan R-bounded instead of an R-deep join tree.
    *
    * `canonEdges`: canonical undirected (a, b) with a < b, deduplicated.
    * Returns surviving (node, deg) — degree within the peeled subgraph. */
  /** Degree assortativity — the Pearson correlation of endpoint degrees
    * over the DOUBLED (both orientations) edge list, the standard Newman
    * r: do high-degree nodes attach to high-degree nodes? Degrees are
    * integers, so the five moments accumulate EXACTLY as DECIMAL(38,0)
    * (shuffle-order-independent; per-row products stay in int64 — holds
    * to degree ≈ 3·10⁹, i.e. any graph whose node count fits an int);
    * the final r follows the q_corr double op order, so the whole face
    * is bit-exact cross-engine. Cost: one degree aggregate + two
    * node-keyed equi-joins + one map-side-combinable aggregate.
    *
    * `canonEdges`: canonical undirected (a, b) with a < b, deduplicated. */
  def assortativity(canonEdges: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d380 = DecimalType(38, 0)
    val e = canonEdges.select(col("a"), col("b")).localCheckpoint(eager = true)
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("deg"))
    val dir = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    dir
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .agg(count(lit(1)).as("n2"),
        sum_dec_exact(col("du"), 0).as("sx"),
        sum_dec_exact(col("dv"), 0).as("sy"),
        sum_dec_exact(col("du") * col("du"), 0).as("sxx"),
        sum_dec_exact(col("dv") * col("dv"), 0).as("syy"),
        sum_dec_exact(col("du") * col("dv"), 0).as("sxy"))
      .select(expr("n2 div 2").as("n_edges"),
        col("n2").cast("double").as("nd"),
        col("sx").cast("double").as("sx"), col("sy").cast("double").as("sy"),
        col("sxx").cast("double").as("sxx"),
        col("syy").cast("double").as("syy"),
        col("sxy").cast("double").as("sxy"))
      .withColumn("den",
        sqrt(col("nd") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("nd") * col("syy") - col("sy") * col("sy")))
      // a REGULAR graph (all degrees equal) has zero degree variance:
      // assortativity is undefined there, and both engines must agree on
      // the spelling — DuckDB's x/0.0 is NULL, Spark ANSI mode THROWS,
      // so the guard makes NULL the shared answer
      .select(col("n_edges"),
        when(col("den") =!= 0.0,
          (col("nd") * col("sxy") - col("sx") * col("sy")) / col("den"))
          .as("assortativity"))
  }

  /** Common-neighbor / Jaccard link prediction — the classic
    * missing-edge scorer: for every NON-adjacent pair (u, w) sharing at
    * least one neighbor, count common neighbors and the Jaccard share
    * |N(u)∩N(w)| / |N(u)∪N(w)| in basis points (integer division — the
    * face stays integer-exact end to end). Wedge enumeration is the
    * triangle-census posture (cost Σ_mid deg²; a production run on a
    * hub-heavy graph caps mid-degree first — same knob as every LSH
    * band cap); the top-k is a TakeOrdered on the total order
    * (cn desc, jaccard desc, a, b), never a global sort.
    *
    * `canonEdges`: canonical undirected (a, b), a < b, deduplicated. */
  def linkPredict(canonEdges: DataFrame, k: Int): DataFrame = {
    val e = canonEdges.select(col("a"), col("b")).localCheckpoint(eager = true)
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("deg"))
    val dir = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    val cn = dir.as("x").join(dir.as("y"), col("x.v") === col("y.u"))
      .filter(col("x.u") < col("y.v"))
      .select(col("x.u").as("a"), col("y.v").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("common_neighbors"))
      .join(e, Seq("a", "b"), "left_anti") // only MISSING edges score
    cn
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
      .withColumn("jaccard_bp", expr(
        "10000 * common_neighbors div (deg_a + deg_b - common_neighbors)"))
      .select(col("a"), col("b"), col("common_neighbors"),
        col("deg_a"), col("deg_b"), col("jaccard_bp"))
      .orderBy(col("common_neighbors").desc, col("jaccard_bp").desc,
        col("a"), col("b"))
      .limit(k)
  }

  def kcore(canonEdges: DataFrame, k: Int, rounds: Int): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node")).unionByName(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var e = canonEdges.select(col("a"), col("b")).localCheckpoint(eager = true)
    val driver: Option[DataFrame] =
      if (!e.schema.fields.forall(f => isLong(f.dataType))) None
      else collectIfSmall(e).flatMap(rows => kcoreDriver(e, rows, k, rounds))
    if (driver.isDefined) return driver.get
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("node"))
      e = e.join(keep.select(col("node").as("a")), "a")
        .join(keep.select(col("node").as("b")), "b")
        .select(col("a"), col("b")).localCheckpoint(eager = true)
    }
    degrees(e).select(col("node"), col("deg").cast("long").as("deg"))
  }

  /** Driver finish ([[SmallEdgesKey]]): the same R peels over the
    * collected (multi-)edge list — degree count per endpoint, drop nodes
    * under k with their edges. Bails on any null endpoint. */
  private def kcoreDriver(e: DataFrame,
      rows: Array[org.apache.spark.sql.Row], k: Int,
      rounds: Int): Option[DataFrame] = {
    var i = 0
    while (i < rows.length) {
      if (rows(i).isNullAt(0) || rows(i).isNullAt(1)) return None
      i += 1
    }
    var edges = rows.map(r => (r.getLong(0), r.getLong(1)))
    def degrees(es: Array[(Long, Long)]) = {
      val d = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
      es.foreach { case (a, b) =>
        d.update(a, d.getOrElse(a, 0L) + 1L)
        d.update(b, d.getOrElse(b, 0L) + 1L)
      }
      d
    }
    for (_ <- 1 to rounds) {
      val deg = degrees(edges)
      edges = edges.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
    }
    val fin = degrees(edges)
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](fin.size)
    fin.foreach { case (n, d) => out.add(org.apache.spark.sql.Row(n, d)) }
    val lt = org.apache.spark.sql.types.LongType
    Some(rowsDF(e.sparkSession, out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", lt,
          e.schema.fields.exists(_.nullable)),
        org.apache.spark.sql.types.StructField("deg", lt, nullable = false)))))
  }
}
