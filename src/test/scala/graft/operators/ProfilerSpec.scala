package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
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

  test("timestamp columns profile as epoch millis") {
    val df = Seq(
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2020-01-02 00:00:00")).toDF("t")
    val r = Profiler.profile(df).collect()(0)
    assert(r.getAs[Double]("max_num") - r.getAs[Double]("min_num") == 86400000.0)
    assert(r.isNullAt(r.fieldIndex("sum_num"))) // summing timestamps is meaningless
  }
}
