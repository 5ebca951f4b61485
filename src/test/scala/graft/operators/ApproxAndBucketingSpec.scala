package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale-technique specs: HLL sketch accuracy, and bucketed tables
  * eliminating the join shuffle (the pre-partitioning story for repeated
  * co-located joins at 100 TB).
  */
class ApproxAndBucketingSpec extends SparkSpec {

  test("approx_count_distinct within its configured error bound") {
    val li = Tables.load(spark, sf, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .collect()(0).getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("approx_percentile lands within tolerance of the exact percentile") {
    val li = Tables.load(spark, sf, "lineitem")
    val exact = li.select(expr("percentile(l_extendedprice, 0.5D)"))
      .collect()(0).getDouble(0)
    val approx = li.select(expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
      .collect()(0).getDouble(0)
    val relErr = math.abs(approx - exact) / exact
    assert(relErr < 0.05, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_bucketing_").toString
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").mode("overwrite").saveAsTable("ord_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketing co-locates both sides: the join itself needs no Exchange
      // (the final groupBy is on the same key, so it reuses the layout too)
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
