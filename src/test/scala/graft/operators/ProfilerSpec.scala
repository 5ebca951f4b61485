package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one row per column, correct stats, nulls counted") {
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, None, Some("a")),
      (3L, Some(7.5), None)).toDF("k", "x", "s")
    val p = Profiler.profile(df).collect().map(r => r.getString(0) -> r).toMap
    assert(p.size == 3)

    val k = p("k")
    assert(k.getAs[Long]("n_nulls") == 0 && k.getAs[Long]("n_notnull") == 3)
    assert(k.getAs[Double]("min_num") == 1.0 && k.getAs[Double]("max_num") == 3.0)
    assert(k.getAs[Double]("sum_num") == 6.0 && k.getAs[Double]("mean_num") == 2.0)
    assert(k.isNullAt(k.fieldIndex("min_str")))

    val x = p("x")
    assert(x.getAs[Long]("n_nulls") == 1 && x.getAs[Long]("n_notnull") == 2)
    assert(x.getAs[Double]("sum_num") == 10.0 && x.getAs[Double]("mean_num") == 5.0)

    val s = p("s")
    assert(s.getAs[Long]("n_nulls") == 1)
    assert(s.getAs[String]("min_str") == "a" && s.getAs[String]("max_str") == "b")
    assert(s.isNullAt(s.fieldIndex("min_num")))
  }

  test("profile plan is one aggregate — no Expand, no extra shuffle") {
    val df = graft.Tables.load(spark, sf, "lineitem")
    val plan = Profiler.profile(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "profiler must not Expand per column")
    // exactly one exchange: partial agg -> single-partition final agg
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("boolean columns profile as 0/1: sum = true count, mean = true rate") {
    val df = Seq(
      (1L, Some(true)), (2L, Some(false)),
      (3L, Some(true)), (4L, None)).toDF("k", "b")
    val p = Profiler.profile(df).collect().map(r => r.getString(0) -> r).toMap
    val b = p("b")
    assert(b.getAs[Long]("n_nulls") == 1 && b.getAs[Long]("n_notnull") == 3)
    assert(b.getAs[Double]("min_num") == 0.0 && b.getAs[Double]("max_num") == 1.0)
    assert(b.getAs[Double]("sum_num") == 2.0)
    assert(math.abs(b.getAs[Double]("mean_num") - 2.0 / 3.0) < 1e-15)
  }

  test("documents and events profiles: full schemas, one pass each") {
    val docs = Profiler.profile(graft.Tables.load(spark, sf, "documents"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(docs.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
    assert(docs("text").getAs[String]("min_str") != null)
    assert(docs("n_chars").getAs[Double]("mean_num") > 0)
    val ev = Profiler.profile(graft.Tables.load(spark, sf, "events"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ev.keySet == Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    // ts profiles as epoch millis with a sane range
    assert(ev("ts").getAs[Double]("max_num") >= ev("ts").getAs[Double]("min_num"))
    assert(ev("ts").isNullAt(ev("ts").fieldIndex("sum_num")))
  }

  test("timestamp columns profile as epoch millis") {
    val df = Seq(
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2020-01-02 00:00:00")).toDF("t")
    val r = Profiler.profile(df).collect()(0)
    assert(r.getAs[Double]("max_num") - r.getAs[Double]("min_num") == 86400000.0)
    assert(r.isNullAt(r.fieldIndex("sum_num"))) // summing timestamps is meaningless
  }

  test("exactPercentiles: interpolation on even/odd counts, nulls, no Percentile buffer") {
    // odd count (5 values): p50 lands exactly on a value; p90 interpolates
    // pos = 0.9*4 = 3.6 -> 40*(4-3.6) + 50*(3.6-3) = 46
    // even count (4 values): p50 pos = 0.5*3 = 1.5 -> (20+30)/2 = 25;
    // p90 pos = 2.7 -> 30*0.3 + 40*0.7 = 37
    val df = Seq(
      ("odd", Some(10.0)), ("odd", Some(20.0)), ("odd", Some(30.0)),
      ("odd", Some(40.0)), ("odd", Some(50.0)),
      ("even", Some(10.0)), ("even", Some(20.0)), ("even", Some(30.0)),
      ("even", Some(40.0)),
      ("allnull", None), ("allnull", None)).toDF("g", "v")
    val out = Profiler.exactPercentiles(df, "g", "v",
        Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("odd", "even", "allnull"))
    assert(out("odd").getAs[Double]("p50") == 30.0)
    assert(math.abs(out("odd").getAs[Double]("p90") - 46.0) < 1e-12)
    assert(out("even").getAs[Double]("p50") == 25.0)
    assert(math.abs(out("even").getAs[Double]("p90") - 37.0) < 1e-12)
    assert(out("allnull").isNullAt(out("allnull").fieldIndex("p50")))
    // matches Spark's own percentile aggregate bit-for-bit on real data
    // (the oracle-compatibility contract), WITHOUT a Percentile buffer
    val li = graft.Tables.load(spark, sf, "lineitem")
    val got = Profiler.exactPercentiles(li, "l_returnflag", "l_extendedprice",
        Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5D)").as("p50"),
        expr("percentile(l_extendedprice, 0.9D)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == want, s"$got vs $want")
    val plan = Profiler.exactPercentiles(li, "l_returnflag", "l_extendedprice",
      Seq("p50" -> 0.5)).queryExecution.optimizedPlan
    val percentiles = plan.collect { case p if p.expressions.exists(_.find {
      case _: org.apache.spark.sql.catalyst.expressions.aggregate.Percentile => true
      case _ => false
    }.isDefined) => p }
    assert(percentiles.isEmpty, "value-buffering Percentile aggregate in plan")
  }

  test("exactPercentilesRanged: bit-identical to the window form, distributed sort") {
    // the few-huge-groups variant must return EXACTLY the window form's
    // values — same interpolation arithmetic over the same sorted order
    val li = graft.Tables.load(spark, sf, "lineitem")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9)
    def asMap(df: org.apache.spark.sql.DataFrame): Map[String, (Double, Double)] =
      df.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val window = asMap(Profiler.exactPercentiles(li, "l_returnflag", "l_extendedprice", ps))
    val ranged = asMap(Profiler.exactPercentilesRanged(li, "l_returnflag", "l_extendedprice", ps))
    assert(ranged == window, s"$ranged vs $window")
    // edge semantics match too: interpolated even/odd groups + all-null group
    val df = Seq(
      ("odd", Some(10.0)), ("odd", Some(20.0)), ("odd", Some(30.0)),
      ("odd", Some(40.0)), ("odd", Some(50.0)),
      ("even", Some(10.0)), ("even", Some(20.0)), ("even", Some(30.0)),
      ("even", Some(40.0)),
      ("allnull", None), ("allnull", None)).toDF("g", "v")
    val out = Profiler.exactPercentilesRanged(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("odd", "even", "allnull"))
    assert(out("odd").getAs[Double]("p50") == 30.0)
    assert(math.abs(out("even").getAs[Double]("p90") - 37.0) < 1e-12)
    assert(out("allnull").isNullAt(out("allnull").fieldIndex("p50")))
  }

  test("entropy: uniform = log2(k) with norm 1, degenerate = 0, skew in between") {
    import spark.implicits._
    // 4 uniform values → exactly 2 bits; single value → 0; 3:1 split known
    val uni = (1 to 80).map(i => s"v${i % 4}").toDF("x")
    val one = Seq.fill(10)("only").toDF("x")
    val skew = (Seq.fill(30)("a") ++ Seq.fill(10)("b")).toDF("x")
    val r1 = Profiler.entropy(uni, Seq("x")).collect()(0)
    assert(r1.getAs[Long]("n_distinct") == 4L)
    assert(r1.getAs[Double]("entropy_bits") == 2.0)
    assert(r1.getAs[Double]("norm_entropy") == 1.0)
    val r2 = Profiler.entropy(one, Seq("x")).collect()(0)
    assert(r2.getAs[Double]("entropy_bits") == 0.0)
    assert(r2.getAs[Double]("norm_entropy") == 0.0)
    val r3 = Profiler.entropy(skew, Seq("x")).collect()(0)
    // H(3/4, 1/4) = 2 - 0.75*log2(3) ≈ 0.811278
    assert(math.abs(r3.getAs[Double]("entropy_bits") - 0.811278) < 1e-6)
    // null group counts as a category like the oracle's GROUP BY
    val withNull = Seq(Some("a"), Some("a"), None, None).toDF("x")
    val r4 = Profiler.entropy(withNull, Seq("x")).collect()(0)
    assert(r4.getAs[Long]("n_distinct") == 2L)
    assert(r4.getAs[Double]("entropy_bits") == 1.0)
  }
}
