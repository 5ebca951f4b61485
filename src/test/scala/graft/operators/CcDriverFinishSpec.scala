package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins the r17 connectedComponents driver finish (Dedup.CcSmallStarsKey):
  * the driver union-find over the pre-contraction star map must produce
  * the identical (doc_id → min reachable id) labeling — rows AND schema —
  * as the distributed pointer-jumping rounds, on fuzzed pair graphs
  * (chains, stars, multi-edges, singleton self-pairs, disconnected
  * components) and through the incrementalCluster composition.
  */
class CcDriverFinishSpec extends SparkSpec {
  import spark.implicits._

  private val Key = Dedup.CcSmallStarsKey

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

  private val rnd = new scala.util.Random(1717)

  test("connectedComponents: driver ≡ distributed on fuzzed pair graphs") {
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(40)
      val pairs = Seq.fill(n)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .toDF("da", "db")
      assertEquivalent(s"cc fuzz $trial")(Dedup.connectedComponents(pairs))
    }
  }

  test("connectedComponents: long chain (multi-round convergence shape)") {
    val pairs = (0L until 64L).map(i => (i, i + 1)).toDF("da", "db")
    assertEquivalent("cc chain")(Dedup.connectedComponents(pairs))
  }

  test("connectedComponents: disconnected stars + self-pairs") {
    val pairs = (Seq((10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L),
      (30L, 30L)) ++ Seq((40L, 41L), (41L, 42L), (40L, 42L))).toDF("da", "db")
    assertEquivalent("cc stars")(Dedup.connectedComponents(pairs))
  }

  test("incrementalCluster composes through the gate unchanged") {
    val map = Seq((1L, 1L), (2L, 1L), (5L, 5L)).toDF("doc_id", "cluster_id")
    val delta = Seq((2L, 6L), (6L, 7L), (8L, 9L)).toDF("da", "db")
    assertEquivalent("incremental")(Dedup.incrementalCluster(map, delta))
  }
}
