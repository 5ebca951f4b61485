package graft.functions

import graft.SparkSpec

/** SQL parity for graft's native expressions: registered functions are
  * callable from spark.sql and agree with the Column API. */
class GraftFunctionsSpec extends SparkSpec {

  test("rolling_hash is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val sqlVal = spark.sql("SELECT rolling_hash('hello world') AS h")
      .collect()(0).getLong(0)
    assert(sqlVal == RollingHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
  }

  test("nfc_normalize: combining marks compose, idempotent, SQL-callable") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val decomposed = "café résumé" // e + COMBINING ACUTE
    val composed = "café résumé"                      // precomposed é
    val df = Seq(
      (1L, decomposed),
      (2L, composed),
      (3L, "plain ascii"),
      (4L, "漢字 🚀 å")).toDF("id", "t") // a + COMBINING RING → å
    val out = df.select(col("id"),
      GraftFunctions.nfc_normalize(col("t")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the un-normalized form really changes; both forms land on the same
    // canonical string — the dedup-miss this pass exists to close
    assert(out(1L) == composed && out(2L) == composed)
    assert(out(3L) == "plain ascii")
    assert(out(4L) == "漢字 🚀 \u00e5")
    // idempotent: normalizing the normalized form is the identity
    val twice = df.select(GraftFunctions.nfc_normalize(
      GraftFunctions.nfc_normalize(col("t"))).as("n"))
      .collect().map(_.getString(0)).toSet
    assert(twice == out.values.toSet)
    // SQL face agrees
    df.createOrReplaceTempView("nfc_t")
    try {
      val viaSql = spark.sql("SELECT nfc_normalize(t) AS n FROM nfc_t")
        .collect().map(_.getString(0)).toSet
      assert(viaSql == out.values.toSet)
    } finally spark.catalog.dropTempView("nfc_t")
  }

  test("cosine_sim matches the composed higher-order-function form exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(1.0, 2.0, -3.0), Array(0.5, -1.5, 2.0)))
      .toDF("a", "b")
    val native = df.select(GraftFunctions.cosine_sim(col("a"), col("b"))).collect()(0).getDouble(0)
    val composed = df.select(
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x) /
        (sqrt(aggregate(transform(col("a"), x => x * x), lit(0.0), (s, x) => s + x)) *
          sqrt(aggregate(transform(col("b"), x => x * x), lit(0.0), (s, x) => s + x))))
    ).collect()(0).getDouble(0)
    assert(native == composed) // bit-identical, same accumulation order
    GraftFunctions.register(spark)
    val sqlVal = spark.sql(
      "SELECT cosine_sim(array(1.0D,2.0D,-3.0D), array(0.5D,-1.5D,2.0D))")
      .collect()(0).getDouble(0)
    assert(sqlVal == native)
  }

  test("winnow_fp is SQL-callable and matches the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val txt = "the quick brown fox jumps over the lazy dog"
    val fromSql = spark.sql(s"SELECT winnow_fp('$txt', 8, 4) AS f")
      .collect()(0).getSeq[Long](0)
    val fromCol = Seq(Tuple1(txt)).toDF("t")
      .select(GraftFunctions.winnow_fp(col("t"), 8, 4))
      .collect()(0).getSeq[Long](0)
    assert(fromSql == fromCol && fromSql.nonEmpty)
  }

  test("stride_win_hashes: fused equals composed transform+substring+xxhash64," +
      " multibyte included") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running onward",
      // multibyte: 2-, 3- and 4-byte UTF-8 chars shift the byte/char map
      "héllo wörld — ünïcode tëxt 漢字かな混じりの文書です 🚀 and some trailing ascii tail",
      "ααββγγδδ εεζζηηθθ ιικκλλμμ ννξξοοππ ρρσσττυυ",
      "short", // < w chars → empty
      "exactly-forty-characters-long-string-ok!") // == w → exactly 1 window
    val df = texts.toDF("text")
    val w = 40; val stride = 10
    val fused = df.select(
      GraftFunctions.stride_win_hashes(col("text"), w, stride).as("hs"))
      .collect().map(_.getSeq[Long](0))
    val composed = df
      .filter(length(col("text")) >= w)
      .select(transform(
        sequence(lit(0), floor((length(col("text")) - w) / stride).cast("int")),
        i => xxhash64(substring(col("text"), lit(1) + i * stride, lit(w)))).as("hs"))
      .collect().map(_.getSeq[Long](0))
    assert(fused.filter(_.nonEmpty).toSeq == composed.toSeq)
    assert(fused(3).isEmpty)          // sub-window text
    assert(fused(4).length == 1)      // exact-width text: one window
    // SQL registration parity
    GraftFunctions.register(spark)
    val fromSql = spark.sql(
      s"SELECT stride_win_hashes('${texts.head}', $w, $stride)")
      .collect()(0).getSeq[Long](0)
    assert(fromSql == fused(0))
  }

  test("cms: merge of per-group sketches preserves the contract; estimates " +
      "never undercount; absent item bounded; SQL-callable") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val toks = Seq.fill(50)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c")
    // two groups with the same eps/conf/seed: the union must count both
    val df = toks.zipWithIndex
      .map { case (t, i) => (i % 2, t) }.toDF("g", "tok")
    val merged = df.groupBy(col("g"))
      .agg(expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").as("sk"))
      .agg(GraftFunctions.cms_merge(col("sk")).as("sk"))
    val est = merged
      .select(explode(array(lit("a"), lit("b"), lit("c"), lit("nope"))).as("item"),
        col("sk"))
      .select(col("item"), GraftFunctions.cms_estimate(col("sk"), col("item")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val eps = math.ceil(75 * 0.001).toLong
    assert(est("a") >= 50L && est("a") <= 50L + eps)
    assert(est("b") >= 20L && est("b") <= 20L + eps)
    assert(est("c") >= 5L && est("c") <= 5L + eps)
    assert(est("nope") >= 0L && est("nope") <= eps)
    // single-sketch path equals the merged two-group path (union exactness
    // of cell-wise sums, same seed)
    val single = df
      .agg(expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").as("sk"))
      .select(GraftFunctions.cms_estimate(col("sk"), lit("a")).as("est"))
      .collect()(0).getLong(0)
    assert(single == est("a"))
    // SQL registration
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("cms_toks")
    val sqlEst = spark.sql(
      """SELECT cms_estimate(cms_merge(sk), 'b') FROM
         (SELECT count_min_sketch(tok, 0.001d, 0.99d, 42) AS sk
          FROM cms_toks GROUP BY g)""").collect()(0).getLong(0)
    assert(sqlEst == est("b"))
  }

  test("cms sketches persist: parquet round-trip then union gives the same estimates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (Seq.fill(40)("a") ++ Seq.fill(9)("b")).zipWithIndex
      .map { case (t, i) => (i % 3, t) }.toDF("g", "tok")
    val sketches = df.groupBy(col("g"))
      .agg(expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_").toString
    // the incremental-maintenance posture: partitions persist their sketch
    // binaries; a later job unions WITHOUT rescanning the source
    sketches.write.mode("overwrite").parquet(dir)
    def estimates(sk: org.apache.spark.sql.DataFrame) = sk
      .agg(GraftFunctions.cms_merge(col("sk")).as("sk"))
      .select(GraftFunctions.cms_estimate(col("sk"), lit("a")).as("ea"),
        GraftFunctions.cms_estimate(col("sk"), lit("b")).as("eb"))
      .collect()(0)
    val live = estimates(sketches)
    val persisted = estimates(spark.read.parquet(dir))
    assert(live == persisted)
    assert(persisted.getLong(0) >= 40L && persisted.getLong(1) >= 9L)
  }

  test("GraftExtensions injects the same function set") {
    // the extensions class is instantiable and wires without error; actual
    // new-session injection is a deploy-time path (spark.sql.extensions)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("aggregate functions are SQL-callable: mg_freq_items and topk_select") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    Seq("a", "b", "a", "c", "a", "b").toDF("tok").createOrReplaceTempView("toks")
    val mg = spark.sql(
      "SELECT sk.items AS items, sk.err_bound AS err FROM " +
        "(SELECT mg_freq_items(tok, 8) AS sk FROM toks)")
      .collect()(0)
    val items = mg.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(items == Seq("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(mg.getLong(1) == 0L)

    Seq((1L, 0.9), (2L, 0.8), (3L, 0.99), (3L, 0.99)).toDF("vec_id", "cos")
      .createOrReplaceTempView("scored")
    val tk = spark.sql(
      "SELECT topk_select(struct(vec_id, cos), 2, true) AS t FROM scored")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(tk == Seq((3L, 0.99), (1L, 0.9))) // dedup'd, (cos desc, id asc)
  }
}
