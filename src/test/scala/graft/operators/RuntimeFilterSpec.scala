package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q_runtime_filter face's claim: with the thresholds pinned, Spark
  * injects a bloom-filter runtime filter so the fact scan probes the
  * dimension's filter result before the shuffle. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom probe on the fact side") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val old = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(keys(0), "0")
      spark.conf.set(keys(1), "-1")
      spark.conf.set(keys(2), "-1")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val n = joined.collect()(0).getLong(0)
      assert(n > 0, "fixture join must match rows")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"), plan)
      // and the result is identical without the filter (pruning only routes)
      spark.conf.set(keys(0), "10GB")
      val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1))).collect()(0).getLong(0)
      assert(plain == n)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
