package graft.operators

import graft.SparkSpec

/** Integer-exact weighted PageRank: hand-computed iterations, weight
  * semantics, and the determinism the integer arithmetic buys. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankInt matches hand-computed iterations (dangling sink included)") {
    // A→B, A→C (split evenly), B→A; C dangles (rank leaks — documented).
    // scale=1000 keeps the hand arithmetic readable.
    val edges = Seq(("A", "B", 1L), ("A", "C", 1L), ("B", "A", 1L))
      .toDF("src", "dst", "w")
    def ranks(iters: Int): Map[String, Long] =
      Graph.pageRankInt(edges, iters = iters, scale = 1000L).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // iter 1: contrib A→B = A→C = (1000·1) div 2 = 500; B→A = 1000
    //   A = 150 + (1000·85) div 100 = 1000; B = C = 150 + (500·85) div 100 = 575
    assert(ranks(1) == Map("A" -> 1000L, "B" -> 575L, "C" -> 575L))
    // iter 2: A→B = A→C = 500 again; B→A = (575·1) div 1 = 575
    //   A = 150 + (575·85) div 100 = 638; B = C = 575
    assert(ranks(2) == Map("A" -> 638L, "B" -> 575L, "C" -> 575L))
  }

  test("weights bias contributions exactly") {
    // A splits 3:1 between B and C — contributions floor-divide by wdeg=4
    val edges = Seq(("A", "B", 3L), ("A", "C", 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRankInt(edges, iters = 1, scale = 1000L).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // contrib B = (1000·3) div 4 = 750 → 150 + 637 = 787
    // contrib C = (1000·1) div 4 = 250 → 150 + 212 = 362
    assert(r("B") == 787L && r("C") == 362L)
    // A has no in-edges: base rank only
    assert(r("A") == 150L)
  }

  test("ranks are identical across partitionings (integer determinism)") {
    val edges = (1L to 200L).map { i =>
      (s"n${i % 23}", s"n${(i * 7) % 23}", (i % 5) + 1)
    }.toDF("src", "dst", "w")
    val a = Graph.pageRankInt(edges.repartition(1), iters = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Graph.pageRankInt(edges.repartition(13), iters = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("bfsHops: hand-checked distances, early stop, hop bound") {
    // path 1-2-3-4-5 plus a chord 1-3 and an isolated node 9
    val undirected = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
    val edges = (undirected ++ undirected.map(e => (e._2, e._1)))
      .toDF("src", "dst")
    val src = Seq(1L).toDF("node")
    def dist(maxHops: Int): Map[Long, Int] =
      Graph.bfsHops(edges, src, maxHops).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // chord 1-3 makes d(3)=1, d(4)=2, d(5)=3; node 9 unreachable
    assert(dist(8) == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3))
    // the hop bound truncates the traversal, not the earlier levels
    assert(dist(2) == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("bfsHops distances are partitioning-invariant") {
    val undirected = (1L to 120L).map(i => (i % 31, (i * 11) % 31))
      .filter(e => e._1 != e._2)
    val edges = (undirected ++ undirected.map(e => (e._2, e._1)))
      .toDF("src", "dst")
    val src = Seq(1L).toDF("node")
    val a = Graph.bfsHops(edges.repartition(1), src, 6).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Graph.bfsHops(edges.repartition(13), src, 6).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b && a.size > 1)
  }

  test("ssspInt: hand-checked costs, hop-bounded relaxation, negative reject") {
    // 1 -10-> 2 -10-> 3, plus a direct heavy 1 -25-> 3: the 2-hop path
    // (20) must win once rounds >= 2; with rounds = 1 only direct edges.
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 25L))
      .toDF("src", "dst", "w")
    val src = Seq(1L).toDF("node")
    def costs(rounds: Int): Map[Long, Long] =
      Graph.ssspInt(edges, src, rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(costs(1) == Map(1L -> 0L, 2L -> 10L, 3L -> 25L))
    assert(costs(2) == Map(1L -> 0L, 2L -> 10L, 3L -> 20L))
    val neg = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      Graph.ssspInt(neg, src, 1).collect()
    }
    assert(ex.getMessage.contains("negative edge weight") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative edge weight")))
  }

  test("ssspInt costs are partitioning-invariant") {
    val edges = (1L to 150L).map(i =>
      ((i % 29), ((i * 13) % 29), (i % 7) + 1)).filter(e => e._1 != e._2)
      .toDF("src", "dst", "w")
    val src = Seq(1L).toDF("node")
    val a = Graph.ssspInt(edges.repartition(1), src, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.ssspInt(edges.repartition(13), src, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.size > 1)
  }

  test("triangleStats: hand-counted triangles and wedges") {
    // K4 on {1,2,3,4}: 4 triangles, 12 wedges, 6 edges; plus a pendant 4-5
    // adding 3 wedges (deg(4)=4 → 6 wedges vs 3 in K4) and no triangle.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r = Graph.triangleStats(edges).collect()(0)
    assert(r.getLong(0) == 7L)   // n_edges
    assert(r.getLong(1) == 15L)  // wedges: 3+3+3+6+0
    assert(r.getLong(2) == 4L)   // triangles
    assert(r.getLong(3) == 12L)  // closed wedge endpoints
    // plan hygiene: the 1-row stats join must not be a nested loop
    val plan = Graph.triangleStats(edges).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("kcore: bounded-round peeling cascades one hop per round") {
    // triangle 1-2-3 with a tail 3-4-5: 2-core peeling removes 5 (deg 1)
    // in round 1, which drops 4 to deg 1 — discovered only in round 2
    // (the bounded-round contract); the triangle is the stable 2-core.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    def core(rounds: Int): Map[Long, Long] =
      Graph.kcore(edges, k = 2, rounds = rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core(1) == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    assert(core(2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(core(3) == core(2)) // converged: extra rounds are no-ops
    // k above the max degree empties the graph without error
    assert(Graph.kcore(edges, k = 5, rounds = 2).collect().isEmpty)
  }

  test("assortativity: star = -1 exactly, regular graph = NULL, mixed pins") {
    // star S3: every edge joins deg 3 to deg 1 → perfectly disassortative
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val rs = Graph.assortativity(star).collect().head
    assert(rs.getLong(0) == 3L && rs.getDouble(1) == -1.0)
    // triangle: all degrees equal → zero variance → undefined → NULL
    // (DuckDB's x/0.0 convention; Spark ANSI would throw unguarded)
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    assert(Graph.assortativity(tri).collect().head.isNullAt(1))
    // hand-computed mixed graph: r = -20/28
    val mixed = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val rm = Graph.assortativity(mixed).collect().head
    assert(rm.getLong(0) == 4L)
    assert(math.abs(rm.getDouble(1) - (-20.0 / 28.0)) < 1e-12)
  }

  test("linkPredict: adjacency excluded, Jaccard bp exact, top-k order") {
    // triangle + tail: only (1,4) and (2,4) are non-adjacent with a
    // common neighbor (3); Jaccard = 1/(2+1-1) = 5000 bp
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graph.linkPredict(g, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.toSet == Set((1L, 4L, 1L, 5000L), (2L, 4L, 1L, 5000L)))
    // square: both diagonals share BOTH corners → Jaccard 10000 bp;
    // k=1 keeps only (1,3) — the (cn desc, jacc desc, a, b) total order
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val top = Graph.linkPredict(sq, k = 1).collect().head
    assert((top.getLong(0), top.getLong(1), top.getLong(2),
      top.getLong(5)) == ((1L, 3L, 2L, 10000L)))
  }
}
