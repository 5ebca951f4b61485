package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer trained ON the corpus (SURVEY.md §2.9) —
  * the real subword tokenization behind `pipeline_pack`/`pipeline_budget`
  * token economics (the whitespace/regex counts in [[TextOps.tokens]] are
  * proxies; packing a 2048-token context window needs the counts the model
  * will actually see).
  *
  * Scale shape, stage by stage:
  *  - WORD COUNTS are one explode + one map-side-combinable aggregate; the
  *    Zipfian head partial-aggregates before the shuffle, so the exchange
  *    carries the distinct-word space, not the corpus;
  *  - the TRAINING VOCAB is the top `maxWords` words by (count, word) — a
  *    bounded TakeOrdered, the same bounded-model argument as
  *    [[TextOps.charNgramCounts]] (the frequency mass BPE cares about
  *    lives in the head; HuggingFace trainers bound identically);
  *  - the MERGE LOOP runs driver-side over that bounded word-frequency
  *    table (nMerges × Σ|word| adds — milliseconds; the [[
  *    Similarity.trainPqCodebooks]] posture: fitting is bounded, applying
  *    is distributed);
  *  - ENCODING is a MAP-ONLY projection: the ranked merges ride into
  *    [[graft.functions.BpeEncode]] as a plan reference object (broadcast
  *    with the plan), so tokenizing 100 TB shuffles nothing.
  *
  * Training is deterministic: pair selection breaks count ties on the
  * lexicographically smallest pair, and word counts arrive in
  * (count desc, word) order from a TakeOrdered, not a shuffle.
  */
object Bpe {

  /** Bounded training vocabulary: the `maxWords` most frequent
    * whitespace-delimited words with their corpus counts, deterministic
    * order (count desc, then word). */
  def wordCounts(docs: DataFrame, maxWords: Int = 20000): Array[(String, Long)] =
    docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

  /** Classic BPE training (Sennrich et al. 2016) over a word-frequency
    * table: start from per-code-point symbols, repeatedly fuse the most
    * frequent adjacent symbol pair (ties → lexicographically smallest
    * pair), recording each fusion as the next-ranked merge. Stops early
    * when no pair reaches `minPairCount`. */
  def trainMerges(words: Seq[(String, Long)], nMerges: Int = 200,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    var seqs: Array[(Array[String], Long)] = words.map { case (w, c) =>
      val al = graft.functions.BpeEncode.codePointSymbols(w)
      (al.toArray(new Array[String](al.size())), c)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < nMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), java.lang.Long.valueOf(c),
            (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
          i += 1
        }
      }
      // deterministic argmax: highest count, then smallest (a, b) — a
      // total order, so the result is independent of map iteration order
      var best: (String, String) = null
      var bestCount = 0L
      counts.forEach { (pair, cBoxed) =>
        val c = cBoxed.longValue()
        if (c > bestCount || (c == bestCount && best != null &&
            (pair._1 < best._1 || (pair._1 == best._1 && pair._2 < best._2)))) {
          best = pair
          bestCount = c
        }
      }
      if (best == null || bestCount < minPairCount) exhausted = true
      else {
        merges += best
        val merged = best._1 + best._2
        seqs = seqs.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += merged
                j += 2
              } else {
                out += syms(j)
                j += 1
              }
            }
            (out.toArray, c)
          }
        }
      }
      iter += 1
    }
    merges.toSeq
  }

  /** Train on the corpus itself: [[wordCounts]] → [[trainMerges]]. */
  def train(docs: DataFrame, nMerges: Int = 200, maxWords: Int = 20000)
      : Seq[(String, String)] = trainMerges(wordCounts(docs, maxWords), nMerges)

  /** (doc_id, n_words, n_tokens): real subword counts, map-only. */
  def tokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.GraftFunctions.bpe_encode(col("text"), merges).as("__toks"),
        TextOps.wsTokenCount(col("text")).as("n_words"))
      .select(col("doc_id"), col("n_words"),
        size(col("__toks")).cast("long").as("n_tokens"))
}
