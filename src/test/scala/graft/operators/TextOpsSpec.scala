package graft.operators

import graft.SparkSpec
import graft.functions.RollingHash
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis specs (SURVEY.md §2.3 #43-46). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace vs BPE-ish") {
    val df = Seq((1L, "Hello, world! 42 tokens-here")).toDF("doc_id", "text")
    val r = TextOps.tokens(df).collect()(0)
    assert(r.getAs[Long]("ws_tokens") == 4L)
    // Hello , world ! 42 tokens - here = 8
    assert(r.getAs[Long]("bpe_tokens") == 8L)
  }

  test("quality ratios on a known string") {
    val df = Seq((1L, "the cat, the hat!")).toDF("doc_id", "text")
    val r = TextOps.quality(df).collect()(0)
    assert(r.getAs[Long]("n_chars") == 17L)
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 17) < 1e-15)
    assert(r.getAs[Double]("digit_ratio") == 0.0)
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 4) < 1e-15)
  }

  test("language ID accuracy > 0.9 on planted real-language texts") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it is happy that you are here for tea"),
      ("en", "this is the best of times and it is the worst of times you know"),
      ("en", "to be or not to be that is the question for all of us"),
      ("en", "the quick brown fox jumps over the lazy dog in the morning"),
      ("en", "it is a truth universally acknowledged that a single man is in want"),
      ("de", "der hund ist nicht mit der katze auf das sofa gegangen und ich auch nicht"),
      ("de", "ich bin mit dem zug gefahren und das war ein gutes erlebnis auf der reise"),
      ("de", "das wetter ist heute nicht gut und ich bleibe mit einem buch zu hause"),
      ("de", "ein mann und eine frau sind nicht auf das fest gekommen ich war allein"),
      ("de", "die sonne ist nicht zu sehen und das macht mich mit der zeit müde"),
      ("fr", "le chat est sur la table et il ne mange pas dans la cuisine je crois"),
      ("fr", "je ne sais pas pour quoi les enfants sont dans une salle et pas dehors"),
      ("fr", "il est venu pour que nous puissions manger une tarte dans le jardin"),
      ("fr", "les fleurs sont belles et je pense que le printemps est pour nous une joie"),
      ("fr", "elle est partie dans une ville pour que le travail ne manque pas je pense"),
      ("es", "el perro y el gato están en un jardín que es de los vecinos por la tarde"),
      ("es", "es un día bonito y los niños están en la playa con un balón por horas"),
      ("es", "que la vida es un sueño y los sueños sueños son es por todos conocido"),
      ("es", "en un lugar de la mancha de cuyo nombre no quiero acordarme por ahora"),
      ("es", "los libros que están en la mesa son de un amigo y es un placer leerlos"))
    val df = samples.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, t, l) }.toDF("doc_id", "text", "lang")
    val pred = TextOps.langId(df.select("doc_id", "text"))
    val joined = pred.join(df, "doc_id")
      .select($"lang_pred" === $"lang").collect().map(_.getBoolean(0))
    val acc = joined.count(identity).toDouble / joined.length
    assert(acc > 0.9, s"langid accuracy $acc")
  }

  test("rolling-hash fingerprint: codegen output matches reference formula") {
    def expected(s: String): Long = {
      val bytes = s.getBytes("UTF-8")
      var h = 1125899906842597L
      bytes.foreach(b => h = h * 257L + (b & 0xff))
      h
    }
    val df = Seq((1L, "hello world"), (2L, "hello worlD"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.fingerprint(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    assert(out(1L) == expected("hello world"))
    assert(out(2L) == expected("hello worlD"))
    assert(out(1L) != out(2L))
    assert(out(3L) == expected(""))
    // interpreted eval path agrees with codegen
    assert(RollingHash.hash(UTF8String.fromString("hello world")) == out(1L))
  }

  test("redact scrubs emails, IPv4s and long digit runs; order matters") {
    val df = Seq(
      (1L, "mail me at jane.doe+spam@example.co.uk today"),
      (2L, "server 10.0.255.7 port 8080"),
      (3L, "card 4111111111111111 pin 1234"),
      (4L, "clean text stays clean")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextOps.redact($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail me at <EMAIL> today") // digits in address don't become <NUM>
    assert(out(2L) == "server <IP> port 8080") // short run survives
    assert(out(3L) == "card <NUM> pin 1234")
    assert(out(4L) == "clean text stays clean")
  }

  test("repetition ratios flag duplicate tokens and lines") {
    val df = Seq(
      (1L, "spam spam spam spam"), // 4 tokens, 1 distinct
      (2L, "all tokens are different"),
      (3L, "line\nline\nother")) // 3 lines, 2 distinct
      .toDF("doc_id", "text")
    val out = TextOps.repetition(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 0.75)
    assert(out(2L)._1 == 0.0)
    assert(out(3L)._2 == 1.0 - 2.0 / 3.0)
  }

  test("ngramFreq counts token bigrams across the corpus with a threshold") {
    val docs = Seq(
      (1L, "a b c a b"),
      (2L, "a b x"),
      (3L, "z")) // too short for a bigram
      .toDF("doc_id", "text")
    val out = TextOps.ngramFreq(docs, n = 2, minCount = 2L).collect()
      .map(r => r.getAs[String]("ngram") -> r.getAs[Long]("n_occurrences")).toMap
    // "a b" appears twice in doc1 and once in doc2; everything else once
    assert(out == Map("a b" -> 3L), s"got $out")
    val tri = TextOps.ngramFreq(docs, n = 3, minCount = 1L).collect()
      .map(r => r.getAs[String]("ngram")).toSet
    assert(tri == Set("a b c", "b c a", "c a b", "a b x"), s"got $tri")
  }

  test("char-ngram LM: clean text scores low, gibberish high, all-OOV stays finite") {
    // in-distribution corpus: repetitive English-like text; one gibberish
    // doc drawn from characters the corpus never uses
    val clean = (1 to 20).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog " * 3))
    val docs = (clean :+ (100L, "zqxj vvkk wqzz jxqv zzzz qqqq xxxx jjjj"))
      .toDF("doc_id", "text")
    val model = TextOps.charNgramCounts(docs, n = 3, minCount = 2L)
    val out = TextOps.lmScore(docs, model).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_oov"), r.getAs[Double]("score"))).toMap
    // clean docs share every gram with the model: zero OOV, low score
    assert(out(1L)._1 == 0L)
    // gibberish: mostly OOV grams, and the add-one-smoothed score stays
    // finite while sitting far above every clean doc's
    val garbage = out(100L)
    assert(garbage._1 > 20L, s"gibberish OOV count: $garbage")
    assert(!garbage._2.isNaN && !garbage._2.isInfinite)
    val worstClean = clean.map(c => out(c._1)._2).max
    assert(garbage._2 > worstClean + 1.0,
      s"gibberish ${garbage._2} vs worst clean $worstClean")
    // the model itself: short texts (< n chars) degrade to one whole-text gram
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val tinyGrams = TextOps.charNgramCounts(tiny, n = 3, minCount = 1L).collect()
    assert(tinyGrams.map(_.getString(0)).toSeq == Seq("ab"))
  }

  test("fused lm_score equals the composed explode+join form: identical gram " +
      "accounting on multibyte/short/empty text, score within float-sum tolerance") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "HÉLLO wörld 漢字かな and some 🚀 multibyte téxt"), // case + multibyte
      (3L, "ab"),   // shorter than n: one whole-text gram
      (4L, ""),     // empty: one empty gram
      (5L, "zq"),   // short OOV
      (6L, "the quick brown fox")
    ).toDF("doc_id", "text")
    val model = TextOps.charNgramCounts(docs, n = 3, minCount = 1L)
    val fused = TextOps.lmScore(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val composed = TextOps.lmScoreComposed(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(fused.keySet == composed.keySet)
    fused.foreach { case (id, (ng, noov, score)) =>
      val (cg, coov, cscore) = composed(id)
      assert(ng == cg && noov == coov, s"doc $id: ($ng,$noov) vs ($cg,$coov)")
      // same per-gram terms, potentially different summation order
      assert(math.abs(score - cscore) < 1e-9, s"doc $id: $score vs $cscore")
    }
    // the fused plan is shuffle-free: scoring is a pure projection
    val plan = TextOps.lmScore(docs, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a map-only plan:\n$plan")
  }

  test("lineDedup drops corpus-frequent lines, keeps order, blanks and unique docs") {
    val banner = "ACCEPT ALL COOKIES"
    val docs = Seq(
      (1L, s"$banner\nunique one\n\nunique two"),
      (2L, s"intro\n$banner\noutro"),
      (3L, s"$banner\nbody three"),
      (4L, banner), // every line boilerplate → document disappears
      (5L, "standalone document")).toDF("doc_id", "text")
    val out = TextOps.lineDedup(docs, maxLineDf = 3L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(out == Map(
      1L -> "unique one\n\nunique two", // blank line survives, order kept
      2L -> "intro\noutro",
      3L -> "body three",
      5L -> "standalone document"), s"got $out")
  }

  test("chunk: full coverage with overlap, short tail, empty text excluded") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val docs = Seq(1L -> text, 2L -> "short", 3L -> "").toDF("doc_id", "text")
    val rows = TextOps.chunk(docs, size = 200, stride = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // offsets 0,150,300,450 → 4 chunks; tail = 520-450 = 70 chars
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.map(_._4).toSeq == Seq(200L, 200L, 200L, 70L))
    d1.foreach { case (_, id, chunk, _) =>
      assert(chunk == text.slice(id.toInt * 150, id.toInt * 150 + 200))
    }
    // every char covered: stride-prefixes + full tail reconstruct the text
    assert(d1.dropRight(1).map(_._3.take(150)).mkString + d1.last._3 == text)
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "short", 5L)))
    assert(!rows.exists(_._1 == 3L))
  }

  test("winnow: shared substrings >= k+w-1 guarantee a shared fingerprint") {
    val shared = "zqxjvkwpfy distinctive shared span here"
    val docs = Seq(
      (1L, s"left padding text then $shared and a tail"),
      (2L, s"completely other beginning $shared different end"),
      (3L, "no overlap with the others at all in this one"),
      (4L, "tiny")).toDF("doc_id", "text")
    val fps = TextOps.winnow(docs, k = 8, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the winnowing guarantee: docs 1 and 2 share a >= 11-char substring
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    // selection density ~ 2/(w+1): far fewer fingerprints than grams
    val len1 = s"left padding text then $shared and a tail".length
    assert(byDoc(1L).size < len1 - 7)
    // docs shorter than k+w-1 produce nothing
    assert(!byDoc.contains(4L))
    // masked selection domain: every fingerprint is non-negative
    assert(fps.forall(_._2 >= 0))
    // deterministic
    val again = TextOps.winnow(docs, k = 8, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == fps.toSet)
    // the fused expression IS the composed form, bit for bit — including
    // on real data and on planted multibyte text (2- and 3-byte chars
    // exercise the char-boundary index against substr's code-point math)
    val multi = Seq(
      (100L, "tschüß façade naïve 中文数据处理引擎测试 mixed ascii tail"),
      (101L, "中文数据处理引擎测试 shared span here too for overlap"))
      .toDF("doc_id", "text")
    val realBase = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val real = realBase.unionByName(multi)
    val fused = TextOps.winnow(real, k = 8, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val composed = TextOps.winnowComposed(real, k = 8, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused == composed && fused.nonEmpty)
  }

  test("profile classifier: fits distinctive vocab, generalizes, OOV -> und") {
    // train docs (doc_id % 10 != 0 convention is the face's, not the
    // operator's): 4 docs per lang with distinctive vocab, each token
    // appearing >= 3 times so the minCount=3 cut keeps it
    val labels = Seq("de", "en")
    val train = Seq(
      (1L, "en", "the cat sat the dog ran the end"),
      (2L, "en", "the fast cat and the slow dog and more"),
      (3L, "en", "cat dog the and cat dog the and"),
      (4L, "de", "der hund und die katze und der ball"),
      (5L, "de", "die katze der hund die katze und"),
      (6L, "de", "und der die hund katze und der die")
    ).toDF("doc_id", "lang", "text")
    val model = TextOps.trainProfileModel(train, labels, minCount = 3L)
    val mrows = model.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // vocab cut: tokens under 3 occurrences per (token, label) are gone
    assert(!mrows.contains("fast") && !mrows.contains("ball"))
    assert(mrows.contains("the") && mrows.contains("und"))
    // weight = floor(count * 1e9 / label total): "the" is en-only
    assert(mrows("the")._1 == 0L && mrows("the")._2 > 0L)
    val eval = Seq(
      (10L, "en", "the cat and the dog"),       // en vocab
      (11L, "de", "der hund und die katze"),    // de vocab
      (12L, "fr", "zzz qqq www")                // fully OOV -> und
    ).toDF("doc_id", "lang", "text")
    val preds = TextOps.profileClassify(eval, model, labels)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(10L) == "en")
    assert(preds(11L) == "de")
    assert(preds(12L) == "und")
  }

  test("bm25: hand-computed integer scores, rarity ordering, top-k plan") {
    import org.apache.spark.sql.functions.col
    // 4 docs, avgdl = (4+4+4+4) div 4 = 4. "rare" appears in 1 doc,
    // "common" in 3 — the rare term must outscore the common one.
    val docs = Seq(
      (1L, "rare alpha beta gamma"),
      (2L, "common alpha beta gamma"),
      (3L, "common common beta gamma"),
      (4L, "common alpha beta gamma")
    ).toDF("doc_id", "text")
    val out = TextOps.bm25(docs, Seq("rare", "common"), k = 4)
    val scores = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Hand-compute doc 1 ("rare", tf=1, dl=4, avg=4, N=4, df=1):
    // idfr = (2*(4-1)+1)*1e6 div (2*1+1) = 7e6 div 3 = 2333333 (under the
    // 2^20*1e6 cap); sterm = 2333333*22*1*4*1000 div (10*4*1+3*4+9*4)
    //                      = 2333333*88000 div 88 = 2333333000
    assert(scores(1L) == 2333333000L)
    // doc 3 ("common", tf=2, df=3): idfr = 3e6 div 7 = 428571;
    // sterm = 428571*22*2*4*1000 div (10*4*2+3*4+9*4)
    //       = 75428496000 div 128 = 589285125
    assert(scores(3L) == 589285125L)
    // rare-term doc ranks first; same-score common docs tie-break by doc_id
    val ranked = out.collect().map(_.getLong(0)).toSeq
    assert(ranked.head == 1L)
    assert(scores(2L) == scores(4L) && ranked.indexOf(2L) < ranked.indexOf(4L))
    // top-k is a TakeOrdered (per-partition heads), never a global Sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
  }

  test("bm25 over the persisted inverted index: bit-identical scores, " +
      "bucket-pruned postings scan, no corpus access") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "rare alpha beta gamma"),
      (2L, "common alpha beta gamma"),
      (3L, "common common beta gamma"),
      (4L, "common alpha beta gamma"),
      (5L, "unrelated tokens entirely here")
    ).toDF("doc_id", "text")
    val wh = java.nio.file.Files.createTempDirectory("graft_textidx_").toString
    TextOps.writeTextIndex(docs, "text_idx", s"$wh/text_idx", buckets = 8)
    try {
      val terms = Seq("rare", "common")
      val transient0 = TextOps.bm25(docs, terms, k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val dfI = TextOps.bm25Indexed(spark, "text_idx", terms, k = 5)
      val indexed = dfI.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // the scoring tail is shared code: scores AND order identical
      assert(indexed == transient0 && indexed.nonEmpty)
      // plan: bucket-pruned postings scan (tok IN terms), TakeOrdered
      // top-k, and no scan of anything but the index
      val plan = dfI.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("TakeOrderedAndProject"), plan)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"postings scan should bucket-prune:\n$plan")
      assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"2 terms over 8 buckets must prune: $sel")
      val scans = "FileScan parquet [^\\s]*".r.findAllIn(plan).toSeq
      assert(scans.nonEmpty && scans.forall(_.contains("text_idx")), scans.toString)
    } finally {
      spark.sql("DROP TABLE IF EXISTS text_idx")
      spark.sql("DROP TABLE IF EXISTS text_idx_meta")
    }
  }

  test("mergeTextIndex: merged probe == full-corpus probe; re-merging the " +
      "same delta is a no-op (retry idempotence)") {
    import org.apache.spark.sql.functions.col
    val base = Seq(
      (1L, "rare alpha beta gamma"),
      (2L, "common alpha beta gamma"),
      (3L, "common common beta gamma")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (4L, "common alpha beta gamma"),
      (5L, "unrelated tokens entirely here"),
      (6L, "!!! ???")  // tokenizes to NOTHING — presence-row path
    ).toDF("doc_id", "text")
    val full = base.unionByName(delta)
    val wh = java.nio.file.Files.createTempDirectory("graft_textidxm_").toString
    TextOps.writeTextIndex(base, "tm_base", s"$wh/base", buckets = 4)
    TextOps.mergeTextIndex(spark, "tm_base", delta, "tm_merged",
      s"$wh/merged", buckets = 4)
    try {
      val terms = Seq("rare", "common")
      val fromFull = TextOps.bm25(full, terms, k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val fromMerged = TextOps.bm25Indexed(spark, "tm_merged", terms, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fromMerged == fromFull && fromMerged.nonEmpty)
      // stats sidecar merged additively — INCLUDING the token-less doc
      // (writeTextIndex counts every doc in n; merge must agree)
      val meta = spark.table("tm_merged_meta").collect()(0)
      assert(meta.getLong(0) == 6L) // n docs
      // a RETRIED delta (docs 4/5/6 already indexed — doc 6 only via its
      // presence row) must change nothing: double-held postings would
      // shift df, a re-counted token-less doc would shift avgdl
      val before = spark.table("tm_merged").count()
      TextOps.mergeTextIndex(spark, "tm_merged", delta, "tm_retry",
        s"$wh/retry", buckets = 4)
      assert(spark.table("tm_retry").count() == before)
      assert(spark.table("tm_retry_meta").collect()(0).getLong(0) == 6L)
    } finally {
      Seq("tm_base", "tm_merged", "tm_retry").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"DROP TABLE IF EXISTS ${t}_meta")
      }
    }
  }

  test("appendTextIndexSegment: O(delta) write — base files byte-identical " +
      "after append, segment holds delta docs only; probe == full corpus; " +
      "retried delta appends an EMPTY segment") {
    import org.apache.spark.sql.functions.col
    val base = Seq(
      (1L, "rare alpha beta gamma"),
      (2L, "common alpha beta gamma"),
      (3L, "common common beta gamma")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (4L, "common alpha beta gamma"),
      (5L, "unrelated tokens entirely here"),
      (6L, "!!! ???")  // tokenizes to NOTHING — presence-row path
    ).toDF("doc_id", "text")
    val full = base.unionByName(delta)
    val wh = java.nio.file.Files.createTempDirectory("graft_textseg_").toString
    TextOps.writeTextIndex(base, "ts_base", s"$wh/base", buckets = 4)
    def listing(p: String): Seq[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p)).map(f => (f.getPath, f.length, f.lastModified))
    }
    val baseBefore = listing(s"$wh/base")
    TextOps.appendTextIndexSegment(spark, Seq("ts_base"), delta, "ts_s1",
      s"$wh/s1", buckets = 4)
    try {
      // the append's write cost is the DELTA: base dir byte-identical
      // (same files, same sizes, same mtimes — nothing rewritten), and
      // the segment holds exactly the delta's doc ids
      assert(listing(s"$wh/base") == baseBefore)
      val segIds = spark.table("ts_s1").select(col("doc_id"))
        .distinct().collect().map(_.getLong(0)).toSet
      assert(segIds == Set(4L, 5L, 6L))
      assert(spark.table("ts_s1_meta").collect()(0).getLong(0) == 3L)
      // probe over base+segment == transient full-corpus scores
      val terms = Seq("rare", "common")
      val fromFull = TextOps.bm25(full, terms, k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val fromSeg = TextOps.bm25SegmentsProbe(spark,
        Seq("ts_base", "ts_s1"), terms, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fromSeg == fromFull && fromSeg.nonEmpty)
      // retry: the same delta anti-joins away entirely (doc 6 via its
      // presence row) — empty segment, zero-count meta, probe unchanged
      TextOps.appendTextIndexSegment(spark, Seq("ts_base", "ts_s1"), delta,
        "ts_s2", s"$wh/s2", buckets = 4)
      assert(spark.table("ts_s2").count() == 0L)
      assert(spark.table("ts_s2_meta").collect()(0).getLong(0) == 0L)
      val withRetry = TextOps.bm25SegmentsProbe(spark,
        Seq("ts_base", "ts_s1", "ts_s2"), terms, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(withRetry == fromFull)
    } finally {
      Seq("ts_base", "ts_s1", "ts_s2").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"DROP TABLE IF EXISTS ${t}_meta")
      }
    }
  }

  test("readability: hand-counted FRE; unpunctuated doc is one sentence; " +
    "empty doc scores NULL not NaN") {
    import spark.implicits._
    val docs = Seq(
      // 5 words, 2 sentences; vowel-group runs ([aeiouy]+, y included):
      // h(e)ll(o) w(o)rld h(o)w (a)r(e) (you) = 7
      (1L, "Hello world. How are you?"),
      (2L, "no terminal punctuation here"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextOps.readability(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") == 5L)
    assert(r1.getAs[Long]("n_sentences") == 2L)
    assert(r1.getAs[Long]("n_syllables") == 7L)
    // 206.835 - 1.015*(5/2) - 84.6*(7/5) = 206.835 - 2.5375 - 118.44
    assert(math.abs(r1.getAs[Double]("fre") - 85.8575) < 1e-9)
    assert(out(2L).getAs[Long]("n_sentences") == 1L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("fre")))
  }

  test("paragraphDedup drops corpus-frequent paragraphs, keeps order") {
    val footer = "subscribe to our newsletter\ncontact us" // multi-LINE para
    val docs = Seq(
      (1L, s"alpha body\n\n$footer\n\nunique tail"),
      (2L, s"$footer\n\nbeta body"),
      (3L, s"gamma body\n\n$footer"),
      (4L, footer), // all paragraphs boilerplate → document disappears
      (5L, "standalone body")).toDF("doc_id", "body")
    val out = TextOps.paragraphDedup(docs, maxParaDf = 3L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(out == Map(
      1L -> "alpha body\n\nunique tail", // order kept across the gap
      2L -> "beta body",
      3L -> "gamma body",
      5L -> "standalone body"), s"got $out")
    // single-line dedup would NOT drop the footer (each line df < cap
    // is false here, but a para spanning lines is one unit): assert the
    // multi-line footer vanished as a whole, newline intact elsewhere
    assert(!out(1L).contains("subscribe"))
  }

  test("forgetTextIndex ≡ from-scratch index over the reduced corpus " +
      "(postings, per-term df, stats sidecar)") {
    val docs = Seq(
      (1L, "spark window hash"),
      (2L, "spark stream"),   // forgotten: spark df must drop 3 → 2
      (3L, "spark hash hash"),
      (4L, "window stream stream")).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_forget_idx_")
    TextOps.writeTextIndex(docs, "t_forget_base", root.resolve("b").toString)
    TextOps.forgetTextIndex(spark, "t_forget_base",
      Seq(2L).toDF("doc_id"), "t_forget_out", root.resolve("o").toString)
    TextOps.writeTextIndex(docs.filter($"doc_id" =!= 2L),
      "t_forget_ref", root.resolve("r").toString)
    def rows(t: String) = spark.table(t)
      .collect().map(_.toString).sorted.toSeq
    assert(rows("t_forget_out") == rows("t_forget_ref"))
    assert(rows("t_forget_out_meta") == rows("t_forget_ref_meta"))
    // and the fix really happened: spark's surviving postings carry df 2
    val sparkDf = spark.table("t_forget_out")
      .filter($"tok" === "spark").select($"df").distinct().collect()
    assert(sparkDf.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("cdcChunks: lossless, and boundaries re-synchronize after a prefix edit") {
    val base = ("the quick brown fox jumps over the lazy dog and keeps " +
      "running through the open fields every single morning ") * 3
    val docs = Seq((1L, base), (2L, "INSERTED PREFIX " + base))
      .toDF("doc_id", "text")
    val ch = TextOps.cdcChunks(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    val c1 = ch(1L).map(_.getString(2)).toList
    val c2 = ch(2L).map(_.getString(2)).toList
    // lossless: chunks concatenate back to the exact input
    assert(c1.mkString == base)
    assert(c2.mkString == "INSERTED PREFIX " + base)
    // the CDC property stride windows lack: after the first boundary the
    // chunking re-synchronizes, so every later chunk of the original
    // reappears verbatim in the prefixed twin
    assert(c1.size >= 3, s"test string produced too few chunks: $c1")
    assert(c1.drop(1).toSet.subsetOf(c2.toSet),
      s"missing: ${c1.drop(1).toSet -- c2.toSet}")
  }

  test("cdcChunks (fused CdcChunks expr) == cdcChunksComposed, multibyte included") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog " * 5,
      "ab",                       // below the 4-char gate: no rows
      "abcd",                     // exactly at the gate
      "aaaaaaaaaaaaaaaaaaaaaaaa", // uniform content
      "héllo wörld ünïcode tèxt — spëcial chars äß€ everywhere " * 3,
      "漢字かなカナ混じりテキストの境界検査" * 4,
      "tab\tand\nnewline  double  spaces " * 6)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fused = TextOps.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val composed = TextOps.cdcChunksComposed(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(fused == composed)
    // and chunks stay lossless per doc
    val byDoc = fused.groupBy(_._1)
    texts.zipWithIndex.filter(_._1.length >= 4).foreach { case (t, i) =>
      assert(byDoc(i.toLong).sortBy(_._2).map(_._3).mkString == t)
    }
  }

  test("blockByDomainSuffix: exact, subdomain, and non-match; equi-join plan") {
    val hosts = Seq(
      (1L, "ads.example.com"),
      (2L, "sub.ads.example.com"), // nested subdomain still blocked
      (3L, "example.com"),         // parent of a blocked domain: NOT blocked
      (4L, "notads.example.com"),  // suffix must respect label boundary
      (5L, "clean.org"),
      // 10 labels > maxLabels=8: the cap must drop the LONGEST
      // suffixes, never the registrable-domain one (r14 ADVICE — the
      // old start-positions-1..maxLabels spelling silently passed this)
      (6L, "a.b.c.d.e.f.g.h.ads.example.com"),
      // 10-label host blocked by its EXACT full name: the full-host
      // suffix must survive the cap too (r15 review)
      (7L, "x.y.z.w.v.u.t.s.deep.example.org")).toDF("doc_id", "host")
    val bl = Seq("ads.example.com", "tracker.net",
      "x.y.z.w.v.u.t.s.deep.example.org").toDF("domain")
    val out = TextOps.blockByDomainSuffix(hosts, "host", bl)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("is_blocked")).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> false, 6L -> true, 7L -> true), s"got $out")
    // the matching layer must be an EQUI join (hash/broadcast), never a
    // per-entry LIKE scan: no nested-loop join in the plan
    val plan = TextOps.blockByDomainSuffix(hosts, "host", bl)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-equi join in:\n$plan")
  }
}
