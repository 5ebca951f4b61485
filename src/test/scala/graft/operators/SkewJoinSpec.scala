package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join: identical result to the plain join, salt actually spreads
  * a hot key across distinct salt values. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals plain inner join") {
    // key 1 is hot: 1000 of 1010 rows
    val left = ((1 to 1000).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (i.toLong + 1, i.toLong))).toDF("k", "payload")
    val right = Seq((1L, "hot"), (2L, "a"), (5L, "b")).toDF("k", "label")

    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "label").collect().map(_.toString).sorted
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "payload", salts = 8)
      .select("k", "payload", "label").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("hot key spreads across multiple salt values") {
    val left = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val nSalts = left
      .withColumn("__salt", pmod(xxhash64(col("payload")), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(nSalts == 8)
  }

  // When each lever applies:
  //   - salting: deterministic, works for any join type the pattern covers,
  //     but pays `salts`× replication of the right side on every run;
  //   - AQE skew-join: zero-cost when data is not skewed, splits oversized
  //     partitions at runtime, but only for sort-merge joins and only when
  //     the skew exceeds its thresholds.
  // The two specs below demonstrate both on the same hot-key table.

  private def skewedFrames() = {
    val pad = "x" * 100
    val left = ((1 to 20000).map(i => (0L, i.toLong, pad)) ++ // hot key: 95%
      (1 to 32).flatMap(k => (1 to 32).map(i => (k.toLong, i.toLong, pad))))
      .toDF("k", "payload", "pad")
    val right = (0 to 32).map(k => (k.toLong, s"label$k")).toDF("k", "label")
    (left, right)
  }

  test("salting flattens the shuffle layout a hot key produces") {
    val (left, _) = skewedFrames()
    def maxShare(df: org.apache.spark.sql.DataFrame, parts: Int, cols: Seq[String]): Double = {
      val sizes = df.repartition(parts, cols.map(col): _*)
        .rdd.mapPartitions(it => Iterator(it.size)).collect()
      sizes.max.toDouble / sizes.sum
    }
    // unsalted: the hot key's partition IS the job's critical path
    val unsalted = maxShare(left, 16, Seq("k"))
    assert(unsalted > 0.9, s"hot key should dominate one partition, got $unsalted")
    // salted: the hot key spreads over 16 (k, salt) groups; even with hash
    // collisions no partition holds more than ~a third of the rows
    val salted = maxShare(
      left.withColumn("__salt", pmod(xxhash64(col("payload")), lit(16L)).cast("int")),
      16, Seq("k", "__salt"))
    assert(salted < 0.35, s"salting should spread the hot key, got $salted")
  }

  test("AQE skew-join splits the straggler partition of a sort-merge join") {
    val (left, right) = skewedFrames()
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      val joined = left.join(right, Seq("k")).select("k", "payload", "label")
      // collect() so it is THIS DataFrame's query execution that runs —
      // count() would build (and adaptively plan) a different query
      assert(joined.collect().length == 20000 + 32 * 32)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew"), s"expected AQE skew handling in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
