package graft.functions

import graft.SparkSpec
import graft.operators.TextOps
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style differential fuzz for the round-9 fused expressions:
  * seeded generators produce adversarial text (multibyte runs, surrogate
  * pairs, whitespace soup, empty/short strings) and the fused native pass
  * must agree with the composed Column-API form it replaced — the same
  * discipline the xlsx scanner differential fuzz applies to the parser.
  * Deterministic (fixed seed) so failures reproduce.
  */
class FusedExprPropSpec extends SparkSpec {
  import spark.implicits._

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    // multibyte soup: 2/3-byte chars, combining marks, CJK
    Gen.listOf(Gen.oneOf('a', ' ', 'é', 'ß', '€', '漢', 'か', 'Ω', '́'))
      .map(_.mkString),
    // supplementary-plane (surrogate pairs in UTF-16, 4-byte UTF-8)
    Gen.listOf(Gen.oneOf("🚀", "𝔘", "a", " ", "b")).map(_.mkString),
    Gen.const(""),
    Gen.const(" "),
    Gen.listOf(Gen.oneOf('x', 'y', '\n', '\t', ' ')).map(_.mkString),
    // long-ish mixed text
    Gen.listOfN(300, Gen.choose(0x20.toChar, 0x2FFF.toChar)).map(_.mkString))

  private def sample(n: Int): Seq[String] = {
    val seed = Seed(20260813L)
    Iterator.iterate((seed, List.empty[String])) { case (s, acc) =>
      val (v, next) = (textGen.pureApply(Gen.Parameters.default, s), s.next)
      (next, v :: acc)
    }.drop(n).next()._2
  }

  test("StrideWinHashes == composed transform+substring+xxhash64 on 200 fuzz texts") {
    import org.apache.spark.sql.functions._
    val texts = sample(200)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for ((w, stride) <- Seq((40, 10), (8, 3), (5, 5), (1, 1))) {
      val fused = df.select(col("id"),
        GraftFunctions.stride_win_hashes(col("text"), w, stride).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composed = df
        .filter(length(col("text")) >= w)
        .select(col("id"), transform(
          sequence(lit(0), floor((length(col("text")) - w) / stride).cast("int")),
          i => xxhash64(substring(col("text"), lit(1) + i * stride, lit(w)))).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      composed.foreach { case (id, hs) =>
        assert(fused(id) == hs, s"w=$w stride=$stride id=$id")
      }
      fused.filterNot(f => composed.contains(f._1)).foreach { case (id, hs) =>
        assert(hs.isEmpty, s"sub-window text must give empty: w=$w id=$id")
      }
    }
  }

  test("StrideWinHashes == composed on MALFORMED UTF-8 (invalid lead bytes)") {
    import org.apache.spark.sql.functions._
    // UTF8String can hold arbitrary bytes (binary→string cast is a reinterpret,
    // not a validation); the fused boundary walk must mirror
    // UTF8String.numBytesForFirstByte — invalid lead bytes advance 1 — or
    // char addressing diverges from Spark's `substring` (r9 ADVICE).
    val payloads: Seq[Array[Byte]] = Seq(
      Array(0x80, 'a', 'b', 'c', 0xBF, 'd').map(_.toByte),          // continuation bytes in lead position
      Array('a', 'b', 0xC3, 'd').map(_.toByte),                      // 2-byte lead swallowing an ASCII byte
      Array(0xF5, 0xFF, 'x', 'y', 'z', 0xFE, 'w').map(_.toByte),     // invalid 0xF5-0xFF leads
      Array(0xE2.toByte, 'a'.toByte, 'b'.toByte, 'c'.toByte),        // 3-byte lead over ASCII tail
      Array(0xC0, 0xAF, 'q', 'r', 's').map(_.toByte),                // overlong-encoding lead pair
      ("ok" + "é").getBytes("UTF-8") ++ Array(0x90.toByte, 'z'.toByte))
    val df = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "raw")
      .select(col("id"), col("raw").cast("string").as("text"))
    for ((w, stride) <- Seq((3, 1), (2, 2), (4, 3))) {
      val fused = df.select(col("id"),
        GraftFunctions.stride_win_hashes(col("text"), w, stride).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composed = df
        .filter(length(col("text")) >= w)
        .select(col("id"), transform(
          sequence(lit(0), floor((length(col("text")) - w) / stride).cast("int")),
          i => xxhash64(substring(col("text"), lit(1) + i * stride, lit(w)))).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      composed.foreach { case (id, hs) =>
        assert(fused(id) == hs, s"malformed w=$w stride=$stride id=$id")
      }
    }
    // A multibyte lead TRUNCATED at the buffer end is the one pinned
    // divergence: UTF8String.substring's boundary walk overshoots numBytes
    // there and Unsafe-copies past the array (undefined trailing bytes), so
    // composed output is not well-defined. The fused walk clamps the final
    // char boundary to the buffer — pin that its output is DEFINED and
    // stable (same value on repeated evaluation) rather than bit-matching UB.
    val trunc = Seq((0L, Array('a', 'b', 0xC3).map(_.toByte)))
      .toDF("id", "raw")
      .select(col("id"), col("raw").cast("string").as("text"))
    val t1 = trunc.select(
      GraftFunctions.stride_win_hashes(col("text"), 3, 1).as("hs"))
      .collect().head.getSeq[Long](0)
    val t2 = trunc.select(
      GraftFunctions.stride_win_hashes(col("text"), 3, 1).as("hs"))
      .collect().head.getSeq[Long](0)
    assert(t1.length == 1 && t1 == t2)
  }

  test("fused CdcChunks == composed HOF chunking on 200 fuzz texts (BMP)") {
    import org.apache.spark.sql.functions._
    // BMP-only: an astral code point (e.g. 🚀 = 128640) overflows the
    // composed form's Int multiply (codePoint * 29791 > 2^31) which ANSI
    // mode turns into a runtime error — the composed spelling's own
    // domain bound, documented on the expression. Every BMP code point
    // keeps the 4-term polynomial within Int range.
    val texts = sample(200).map(_.filter(c => !Character.isHighSurrogate(c)
      && !Character.isLowSurrogate(c)))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fused = graft.operators.TextOps.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val composed = graft.operators.TextOps.cdcChunksComposed(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(fused == composed)
  }

  test("fused SimHash64 == composed explode+64-vote aggregate on 250 fuzz " +
      "texts incl. space-soup edge tokens") {
    import org.apache.spark.sql.functions._
    // the split(" +", -1) edge semantics the byte-walk must mirror:
    // leading/trailing empty tokens, collapsed interior runs, "" = [""]
    val edges = Seq("", " ", "  ", "a", " a", "a ", " a b ", "a  b",
      "é über 漢字", " 🚀 x", "\ttab is not a separator")
    val texts = (sample(250) ++ edges).distinct
    // NULL text is out-of-domain: BOTH forms must DROP the row (the
    // fused expression filters; the composed form loses it at
    // explode(split(NULL))) — pinned here so the row-set identity can
    // never silently diverge on a null-bearing corpus (r15 review)
    val docs = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (texts.length.toLong, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val fused = graft.operators.Dedup.simhashDocs(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = graft.operators.Dedup.simhashDocsComposed(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.keySet == composed.keySet)
    composed.foreach { case (id, sh) =>
      assert(fused(id) == sh,
        s"doc $id ${texts(id.toInt).take(40).replace("\n", "\\n")}: " +
          s"${fused(id)} vs $sh")
    }
  }

  test("fused MinHashSig == composed explode+k-min aggregate on 250 fuzz " +
      "texts incl. space-soup edges and NULL (k = 32 and 8)") {
    import org.apache.spark.sql.functions._
    val edges = Seq("", " ", "  ", "a", " a", "a ", " a b ", "a  b",
      "a b c", " a b c ", "a b c d e", "é über 漢字 kana mixed",
      " 🚀 x y z", "\ttab is not a separator here")
    val texts = (sample(250) ++ edges).distinct
    // NULL text: the fused call site coalesces to "" and the composed
    // spelling shingles NULL to the single "" shingle — SAME signature,
    // row kept by BOTH (minhash differs from simhash here: the banding
    // families pair NULL-text duplicates via the "" shingle)
    val docs = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (texts.length.toLong, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    for (k <- Seq(32, 8)) {
      val fused = graft.operators.Dedup.minhashSig(docs, k).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composed = graft.operators.Dedup.minhashSigComposed(docs, k).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fused.keySet == composed.keySet)
      composed.foreach { case (id, sig) =>
        assert(fused(id) == sig, s"k=$k doc $id " +
          s"'${if (id < texts.length) texts(id.toInt).take(40) else "NULL"}': " +
          s"${fused(id)} vs $sig")
      }
    }
    // degeneracy pin, direct: for a doc with many shingles, the set of
    // argmin base-hashes across positions has size > 1 (independent
    // permutations pick different minima; the old family always picked
    // the same one)
    val longDoc = (0 until 200).map(i => s"tok$i").mkString(" ")
    val shingles = (0 until 198).map(i => s"tok$i tok${i + 1} tok${i + 2}")
    val hs = shingles.map { sh =>
      Math.floorMod(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(sh.getBytes("UTF-8"),
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          sh.getBytes("UTF-8").length, 42L), MinHashSig.P)
    }
    val k = 32
    val argmins = (0 until k).map { i =>
      hs.minBy(h => (h * MinHashSig.aCoef(i) + MinHashSig.bCoef(i)) % MinHashSig.P)
    }.toSet
    assert(argmins.size > 1,
      s"signature still degenerate: every position minimized by one shingle")
    val sigRow = Seq((0L, longDoc)).toDF("doc_id", "text")
    val sig = graft.operators.Dedup.minhashSig(sigRow, k).collect()(0).getSeq[Long](1)
    val expected = (0 until k).map(i =>
      hs.map(h => (h * MinHashSig.aCoef(i) + MinHashSig.bCoef(i)) % MinHashSig.P).min)
    assert(sig == expected, "hand-computed family disagrees with the expression")
  }

  test("fused LmScore == composed explode+join on 120 fuzz texts") {
    val texts = sample(120)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = TextOps.charNgramCounts(docs, n = 3, minCount = 1L)
    val fused = TextOps.lmScore(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val composed = TextOps.lmScoreComposed(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(fused.keySet == composed.keySet)
    composed.foreach { case (id, (cg, coov, cscore)) =>
      val (ng, noov, score) = fused(id)
      assert(ng == cg && noov == coov,
        s"doc $id '${texts(id.toInt)}': ($ng,$noov) vs ($cg,$coov)")
      assert(math.abs(score - cscore) < 1e-9, s"doc $id: $score vs $cscore")
    }
  }
}
