package graft.operators

import graft.SparkSpec
import graft.functions.{BpeEncode, GraftFunctions}
import org.apache.spark.sql.functions._

/** BPE tokenizer specs (SURVEY.md §2.9): training against the
  * hand-computed classic fixture, encode losslessness, determinism, and
  * the packing integration the counts exist for.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich et al. 2016 worked example: low×5 lower×2 newest×6
  // widest×3. Hand-derived merge order with (count desc, pair asc)
  // tie-breaks:
  //   es:9/st:9 tie → (e,s); then (es,t):9; lo:7/ow:7 tie → (l,o);
  //   (lo,w):7; then ew:6/ne:6/w-est:6 tie → (e,w)
  private val wordFreqs: Seq[(String, Long)] =
    Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainMerges reproduces the hand-computed classic merge sequence") {
    val merges = Bpe.trainMerges(wordFreqs, nMerges = 5)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")),
      s"got $merges")
  }

  test("encodeWord applies ranked merges exactly (lowest rank first)") {
    val merges = Bpe.trainMerges(wordFreqs, nMerges = 5)
    val ranks = BpeEncode.rankMap(merges)
    def enc(w: String): Seq[String] = {
      val al = BpeEncode.encodeWord(w, ranks)
      (0 until al.size()).map(al.get)
    }
    // "lowest" is NOT in the training vocab — subword generalization:
    // es → est → lo → low leaves exactly the learned units
    assert(enc("lowest") == Seq("low", "est"))
    assert(enc("newest") == Seq("n", "ew", "est"))
    assert(enc("low") == Seq("low"))
    assert(enc("widest") == Seq("w", "i", "d", "est"))
    // fully OOV word falls back to code points
    assert(enc("xyz") == Seq("x", "y", "z"))
    assert(enc("").isEmpty)
  }

  test("corpus-trained encode: lossless, bounded, deterministic") {
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest newest"),
      (3L, "newest newest newest widest widest widest"),
      (4L, "the lowest newest ideas"),
      (5L, "  spaced   out\ttabs\nand newlines  "),
      (6L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 20, maxWords = 100)
    val enc = docs.select(col("doc_id"), col("text"),
      GraftFunctions.bpe_encode(col("text"), merges).as("toks"))
    enc.collect().foreach { r =>
      val text = r.getString(1)
      val toks = r.getSeq[String](2)
      // losslessness: tokens concatenate to the non-whitespace chars
      assert(toks.mkString("") == text.replaceAll("\\s+", ""),
        s"doc ${r.getLong(0)} not lossless")
    }
    // counts: each word >= 1 token; n_tokens <= non-space chars
    val counts = Bpe.tokenCounts(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts(1L)._1 == 5L && counts(1L)._2 >= 5L)
    assert(counts(6L) == (0L, 0L))
    counts.foreach { case (_, (w, t)) => assert(t >= w) }
    // determinism: training twice gives identical merges
    assert(Bpe.train(docs, nMerges = 20, maxWords = 100) == merges)
  }

  test("packByTokens and budgetTrim accept real BPE counts") {
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest newest"),
      (3L, "newest newest newest widest widest widest"),
      (4L, "the lowest newest ideas")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 3, maxWords = 100)
    val bpeCount = size(GraftFunctions.bpe_encode(col("text"), merges)).cast("long")
    val packed = Packing.packByTokens(docs, capacity = 8L, shards = 2,
      tokenCount = bpeCount)
    val byDoc = packed.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    // n_tokens in the packing output IS the BPE count, not the ws proxy
    val want = docs.select(col("doc_id"), bpeCount.as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == want)
    assert(packed.columns.toSeq == Seq("doc_id", "shard", "n_tokens", "bin"))
    val trimmed = Packing.budgetTrim(docs, lit(1), budgetTokens = 10L,
      tokenCount = bpeCount)
    // the trim point honors the BPE cumulative count: kept docs' BPE
    // tokens (minus the crossing doc) stay under budget
    val keptIds = trimmed.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(keptIds.nonEmpty && keptIds.size < 4)
  }
}
