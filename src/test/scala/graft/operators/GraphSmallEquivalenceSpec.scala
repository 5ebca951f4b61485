package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the r17 small-graph driver finish (Graph.SmallEdgesKey) to the
  * distributed supersteps BIT-FOR-BIT: every iterative operator is run
  * twice on fuzzed graphs — gate wide open (driver loop) vs gate 0
  * (distributed) — and must produce the identical row multiset AND the
  * identical schema. Null-bearing graphs must silently take the
  * distributed path (the r16 ADVICE divergence class: a data-dependent
  * gate must never change answers).
  */
class GraphSmallEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val Key = Graph.SmallEdgesKey

  /** Runs `f` under both gate regimes and asserts identical output. */
  private def assertEquivalent(tag: String)(f: => DataFrame): Unit = {
    val old = spark.conf.get(Key)
    val (dRows, dSchema) =
      try { spark.conf.set(Key, "1000000"); val d = f; (d.collect(), d.schema) }
      finally spark.conf.set(Key, old)
    val (sRows, sSchema) =
      try { spark.conf.set(Key, "0"); val d = f; (d.collect(), d.schema) }
      finally spark.conf.set(Key, old)
    assert(dSchema == sSchema,
      s"$tag schema diverged:\n driver: $dSchema\n dist:   $sSchema")
    val a = dRows.map(_.toString).sorted.mkString("\n")
    val b = sRows.map(_.toString).sorted.mkString("\n")
    assert(a == b, s"$tag rows diverged:\n driver:\n$a\n dist:\n$b")
  }

  private val rnd = new scala.util.Random(4217)

  private def longEdges(n: Int, ids: Int): Seq[(Long, Long)] =
    Seq.fill(n)((rnd.nextInt(ids).toLong, rnd.nextInt(ids).toLong))

  test("pageRankInt: driver ≡ distributed on fuzzed long graphs") {
    for (it <- 0 to 3; _ <- 1 to 4) {
      val edges = longEdges(rnd.nextInt(30), 8)
        .map { case (a, b) => (a, b, 1L + rnd.nextInt(5)) }
        .toDF("src", "dst", "w")
      assertEquivalent(s"pageRank iters=$it")(
        Graph.pageRankInt(edges, iters = it))
    }
  }

  test("pageRankInt: string nodes (the q_pagerank face shape)") {
    for (_ <- 1 to 4) {
      val edges = longEdges(20, 5)
        .map { case (a, b) => (s"t$a", s"t$b", 1L + rnd.nextInt(3)) }
        .toDF("src", "dst", "w")
      assertEquivalent("pageRank strings")(Graph.pageRankInt(edges, iters = 5))
    }
  }

  test("pageRankInt: empty edge list") {
    val edges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assertEquivalent("pageRank empty")(Graph.pageRankInt(edges, iters = 3))
  }

  test("pageRankInt: nulls fall back to the distributed path") {
    val edges = Seq[(Option[Long], Option[Long], Option[Long])](
      (Some(1L), Some(2L), Some(2L)), (None, Some(3L), Some(1L)),
      (Some(2L), None, Some(1L)), (Some(3L), Some(1L), None))
      .toDF("src", "dst", "w")
    assertEquivalent("pageRank nulls")(Graph.pageRankInt(edges, iters = 2))
  }

  test("pageRankInt: nullable-typed but null-free input keeps driver path") {
    val edges = Seq[(Option[Long], Option[Long], Option[Long])](
      (Some(1L), Some(2L), Some(2L)), (Some(2L), Some(3L), Some(1L)),
      (Some(3L), Some(1L), Some(4L)))
      .toDF("src", "dst", "w")
    assertEquivalent("pageRank nullable")(Graph.pageRankInt(edges, iters = 4))
  }

  test("labelPropagate: driver ≡ distributed on fuzzed canonical graphs") {
    for (r <- 0 to 3; _ <- 1 to 4) {
      val edges = longEdges(rnd.nextInt(40), 12)
        .filter { case (a, b) => a < b }.distinct
        .toDF("a", "b")
      assertEquivalent(s"labelPropagate rounds=$r")(
        Graph.labelPropagate(edges, rounds = r))
    }
  }

  test("labelPropagate: nulls fall back") {
    val edges = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(2L)), (None, Some(3L)), (Some(2L), Some(4L)))
      .toDF("a", "b")
    assertEquivalent("labelPropagate nulls")(Graph.labelPropagate(edges, 3))
  }

  test("bfsHops: driver ≡ distributed incl. early frontier exhaustion") {
    for (hops <- 0 to 4; _ <- 1 to 3) {
      val edges = longEdges(rnd.nextInt(30), 10).toDF("src", "dst")
      val src = Seq(0L, 1L).toDF("node")
      assertEquivalent(s"bfs maxHops=$hops")(
        Graph.bfsHops(edges, src, maxHops = hops))
    }
    // disconnected source: frontier dies immediately
    val edges = Seq((5L, 6L), (6L, 7L)).toDF("src", "dst")
    assertEquivalent("bfs disconnected")(
      Graph.bfsHops(edges, Seq(100L).toDF("node"), maxHops = 8))
  }

  test("ssspInt: driver ≡ distributed on weighted digraphs") {
    for (r <- 0 to 4; _ <- 1 to 3) {
      val edges = longEdges(rnd.nextInt(30), 10)
        .map { case (a, b) => (a, b, rnd.nextInt(9).toLong) } // w ≥ 0
        .toDF("src", "dst", "w")
      val src = Seq(0L).toDF("node")
      assertEquivalent(s"sssp rounds=$r")(Graph.ssspInt(edges, src, rounds = r))
    }
  }

  test("kcore: driver ≡ distributed across k and rounds") {
    for (k <- 1 to 3; r <- 1 to 3) {
      val edges = longEdges(rnd.nextInt(50), 12)
        .filter { case (a, b) => a < b }.distinct
        .toDF("a", "b")
      assertEquivalent(s"kcore k=$k rounds=$r")(Graph.kcore(edges, k, r))
    }
  }
}
