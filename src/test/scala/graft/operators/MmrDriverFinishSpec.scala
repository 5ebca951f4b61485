package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins the r18 MMR driver finish (Similarity.MmrSmallKey): the driver
  * greedy loop over the collected shortlist + pair table must produce the
  * identical (query_id, vec_id, mmr_rank) selection — rows AND schema —
  * as the distributed join+window steps, on fuzzed embedding corpora
  * (ties, tiny shortlists where a query runs out of candidates before k,
  * duplicate vectors so cosines tie exactly, varying λ).
  */
class MmrDriverFinishSpec extends SparkSpec {
  import spark.implicits._

  private val Key = Similarity.MmrSmallKey

  private def assertEquivalent(tag: String)(f: => DataFrame): Unit = {
    val old = spark.conf.get(Key, "500000")
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

  private val rnd = new scala.util.Random(4242)

  private def corpus(n: Int, dim: Int, dupEvery: Int): DataFrame =
    (0 until n).map { i =>
      val src = if (dupEvery > 0 && i % dupEvery == 0 && i > 0) i - 1 else i
      val r = new scala.util.Random(src * 7919L)
      (i.toLong, Array.fill(dim)(r.nextDouble() - 0.5).toSeq)
    }.toDF("vec_id", "embedding")

  test("mmrRerank: driver ≡ distributed on fuzzed corpora") {
    for (trial <- 1 to 4) {
      val n = 20 + rnd.nextInt(30)
      val e = corpus(n, 8, dupEvery = 5 + trial)
      assertEquivalent(s"mmr fuzz $trial")(
        Similarity.mmrRerank(e, e.filter($"vec_id" < 4),
          k = 5, m = 8 + trial, lam = 0.5 + trial * 0.1))
    }
  }

  test("mmrRerank: shortlist smaller than k (query runs dry)") {
    val e = corpus(6, 8, dupEvery = 0)
    assertEquivalent("mmr dry")(
      Similarity.mmrRerank(e, e.filter($"vec_id" < 2), k = 5, m = 3))
  }

  test("mmrRerank: exact cosine ties via duplicate vectors") {
    val e = corpus(16, 4, dupEvery = 2)
    assertEquivalent("mmr ties")(
      Similarity.mmrRerank(e, e.filter($"vec_id" < 3), k = 4, m = 6))
  }
}
