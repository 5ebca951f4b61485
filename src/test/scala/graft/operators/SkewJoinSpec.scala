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
}
