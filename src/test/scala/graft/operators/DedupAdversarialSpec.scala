package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adversarial-duplication guardrail (r12 VERDICT brief #7): the sf1
  * checkpoint showed the dd_ pair families are the repo's steepest cost
  * tier under duplicate growth, and nothing pinned their behavior at the
  * pathological limit — EVERY document identical. Without caps that
  * corpus is n²: all documents share every shingle, every minhash band
  * bucket, every simhash pigeonhole key, every winnow fingerprint. These
  * tests plant exactly that corpus (plus a small distinct tail with one
  * true near-dup pair) and pin, for each family, that (a) the duplicate
  * block produces ZERO candidate survivors — the DF/bucket caps classify
  * mega-groups as exact-duplicate mass, which content-hash dedup owns —
  * and (b) the caps do NOT cost recall on normal-sized groups: the
  * planted near-dup pair in the tail is still found.
  */
class DedupAdversarialSpec extends SparkSpec {

  private val nDup = 400

  /** 400 identical documents + 8 distinct + one near-dup pair (ids 9000
    * and 9001 share most of their text). */
  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val dupText = "the quick brown fox jumps over the lazy dog again and " +
      "again in the boilerplate corpus of identical documents"
    val dups = (1 to nDup).map(i => (i.toLong, dupText))
    val tail = (1 to 8).map(i => (8000L + i,
      s"unique document number $i carrying its own words " +
        s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"))
    val near = Seq(
      (9000L, "shared prefix words one two three four five six seven " +
        "eight nine ten eleven twelve ending alpha"),
      (9001L, "shared prefix words one two three four five six seven " +
        "eight nine ten eleven twelve ending beta"))
    (dups ++ tail ++ near).toDF("doc_id", "text")
  }

  private def dupPairs(df: DataFrame, a: String, b: String): Long =
    df.filter(col(a) <= nDup || col(b) <= nDup).count()

  private def hasNearPair(df: DataFrame, a: String, b: String): Boolean =
    df.filter(col(a) === 9000L && col(b) === 9001L).count() == 1L

  test("ngramJaccard: the all-duplicates block caps to ZERO pairs; the " +
      "tail near-dup pair survives") {
    val pairs = Dedup.ngramJaccard(corpus, threshold = 0.5,
      maxShingleDf = 50L)
    assert(dupPairs(pairs, "da", "db") == 0,
      "shingle-DF cap must drop the identical block before the self-join")
    assert(hasNearPair(pairs, "da", "db"), "cap cost recall on a normal pair")
  }

  test("minhashLsh: band buckets past the cap are dropped — no n² " +
      "candidate explosion from identical documents") {
    val pairs = Dedup.minhashLsh(corpus, threshold = 0.5, maxBucketDf = 50L)
    assert(dupPairs(pairs, "da", "db") == 0,
      "bucket-DF cap must drop the identical block's band buckets")
    assert(hasNearPair(pairs, "da", "db"), "cap cost recall on a normal pair")
    // and with the cap disabled the same corpus IS quadratic — the
    // behavior the cap exists to prevent (counted, not timed)
    val uncapped = Dedup.minhashLsh(corpus, threshold = 0.5,
      maxBucketDf = 0L)
    assert(uncapped.count() >= nDup.toLong * (nDup - 1) / 2,
      "sanity: uncapped identical block is pairwise-complete")
  }

  test("simhashNearDup: pigeonhole keys past the cap are dropped") {
    import spark.implicits._
    // the tail pair here shares IDENTICAL text (hamming 0): a one-word
    // edit can flip >maxHamming signature bits on short docs, and this
    // test pins the CAP's behavior, not simhash recall (dd_simhash_check
    // owns the recall oracle)
    val sameTail = corpus.filter(col("doc_id") =!= 9001L)
      .unionByName(Seq((9001L,
        "shared prefix words one two three four five six seven " +
          "eight nine ten eleven twelve ending alpha")).toDF("doc_id", "text"))
    val pairs = Dedup.simhashNearDup(sameTail, maxHamming = 3, nBlocks = 4,
      maxBucketDf = 50L)
    assert(dupPairs(pairs, "da", "db") == 0,
      "table-key cap must drop the identical block's pigeonhole keys")
    assert(hasNearPair(pairs, "da", "db"), "cap cost recall on a normal pair")
  }

  test("winnow fingerprint join: the dd_winnow df-cap pattern zeroes the " +
      "identical block") {
    val w = Window.partitionBy(col("fp"))
    val kept = TextOps.winnow(corpus)
      .withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") <= 20)
      .select(col("fp"), col("doc_id"))
    val pairs = kept.select(col("fp"), col("doc_id").as("da"))
      .join(kept.select(col("fp"), col("doc_id").as("db")), "fp")
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
    assert(dupPairs(pairs, "da", "db") == 0,
      "fp-DF cap must drop the identical block's fingerprints")
    assert(hasNearPair(pairs, "da", "db"), "cap cost recall on a normal pair")
  }
}
