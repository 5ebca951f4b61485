package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual dHash near-dup spec: signature determinism, within-group /
  * cross-group hamming separation on the constructed variant corpus, and
  * pigeonhole recall 1.0 against the exact (all-pairs) hamming criterion.
  */
class PHashSpec extends SparkSpec {
  import spark.implicits._

  // 40 ids → 10 groups of 4: only doc_id feeds the variant generator
  private def fakeDocs = (0L until 40L).map(i => (i, s"d$i", "en", "s", 1L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("dHash signatures are deterministic across decode passes") {
    val blobs = Multimodal.syntheticVariantPngBlobs(spark, fakeDocs)
    val a = Multimodal.dHashBlobs(spark, blobs).orderBy("doc_id").collect()
    val b = Multimodal.dHashBlobs(spark, blobs).orderBy("doc_id").collect()
    assert(a.toSeq.map(_.toString) == b.toSeq.map(_.toString))
    assert(a.length == 40)
  }

  test("variant corpus separates: within-group hamming <= 5, groups apart") {
    val sh = Multimodal.dHashBlobs(spark,
      Multimodal.syntheticVariantPngBlobs(spark, fakeDocs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val within = for {
      g <- 0L until 10L; a <- 0 to 3; b <- (a + 1) to 3
    } yield java.lang.Long.bitCount(sh(g * 4 + a) ^ sh(g * 4 + b))
    val cross = for {
      ga <- 0L until 10L; gb <- (ga + 1) until 10L
    } yield java.lang.Long.bitCount(sh(ga * 4) ^ sh(gb * 4))
    info(s"within-group hamming: min=${within.min} max=${within.max}")
    info(s"cross-group hamming:  min=${cross.min} max=${cross.max}")
    assert(within.max <= 5,
      s"variant edits must stay within the pigeonhole radius, got ${within.max}")
    // unrelated gradients should usually sit far outside the radius
    assert(cross.count(_ > 5) >= cross.length * 6 / 10)
  }

  test("pigeonhole pairs == exact all-pairs hamming criterion (recall 1.0)") {
    val blobs = Multimodal.syntheticVariantPngBlobs(spark, fakeDocs)
    val sigs = Multimodal.dHashBlobs(spark, blobs)
    val got = Multimodal.phashNearDup(spark, blobs, maxHamming = 5, nBlocks = 8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = (for {
      a <- sh.keys; b <- sh.keys if a < b
      if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 5
    } yield (a, b)).toSet
    assert(got == exact)
    // and the construction plants every within-group pair inside the radius
    val planted = (for { g <- 0L until 10L; a <- 0 to 3; b <- (a + 1) to 3 }
      yield (g * 4 + a, g * 4 + b)).toSet
    assert(planted.subsetOf(got))
  }
}
