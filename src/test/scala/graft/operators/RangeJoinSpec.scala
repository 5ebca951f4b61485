package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join: output equals the naive theta join exactly, and the
  * plan is an equi join (no nested-loop/cartesian scan) even with
  * broadcast disabled — the whole point of the binning. */
class RangeJoinSpec extends SparkSpec {

  private def cust = spark.read.parquet(s"$sf/customer.parquet")
    .select(col("c_custkey"), col("c_acctbal"))
  private def supp = spark.read.parquet(s"$sf/supplier.parquet")
    .select(col("s_suppkey"), col("s_acctbal"),
      (col("s_acctbal") - lit(200.0)).as("lo"),
      (col("s_acctbal") + lit(200.0)).as("hi"))

  test("binned equals the naive theta join, bit for bit") {
    val binned = RangeJoin.binned(cust, "c_acctbal", supp, "lo", "hi", 256.0)
      .select("c_custkey", "s_suppkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = cust.join(supp,
        col("c_acctbal") >= col("lo") && col("c_acctbal") <= col("hi"))
      .select("c_custkey", "s_suppkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture must produce matches")
    assert(binned == naive)
  }

  test("narrow bins still cover wide intervals (interval spans many bins)") {
    // width 16 << interval length 400: each interval registers in ~26 bins;
    // results must not change (coverage is by construction) and no pair
    // may duplicate (a point matches in exactly its own bin)
    val wide = RangeJoin.binned(cust, "c_acctbal", supp, "lo", "hi", 16.0)
      .select("c_custkey", "s_suppkey").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(wide.length == wide.toSet.size, "no duplicate pairs")
    val ref = RangeJoin.binned(cust, "c_acctbal", supp, "lo", "hi", 512.0)
      .select("c_custkey", "s_suppkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.toSet == ref)
  }

  test("plan is an equi join even with broadcast disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val binned = RangeJoin.binned(cust, "c_acctbal", supp, "lo", "hi", 16.0)
      val plan = binned.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      // the naive form IS the nested-loop trap binning avoids
      val naive = cust.join(supp,
        col("c_acctbal") >= col("lo") && col("c_acctbal") <= col("hi"))
      val naivePlan = naive.queryExecution.executedPlan.toString
      assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
        naivePlan.contains("CartesianProduct"), naivePlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("empty and inverted intervals are dropped") {
    import spark.implicits._
    val pts = Seq((1L, 5.0), (2L, 10.0)).toDF("id", "v")
    val ivs = Seq((10L, 8.0, 4.0), (11L, 9.0, 11.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.binned(pts, "v", ivs, "lo", "hi", 4.0)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((2L, 11L))) // inverted [8,4] matches nothing
  }
}
