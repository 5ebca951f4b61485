package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property fuzz for the [[Ranked]] distributed-prefix machinery: random
  * key/value tables — heavy ties (small key domains), negative values,
  * empty-ish and skewed shapes — across random partition counts, each
  * compared bit-for-bit against the single-window spelling. The lineitem
  * identities in RankedSpec pin the production faces; this pins the
  * operator itself on shapes the faces never produce (every row one
  * tie-group, all-equal sort keys with distinct tiebreaks, a group that
  * owns 90% of rows). Seeded generator — failures reproduce.
  */
class RankedPropSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  private def randomTable(n: Int, keyDomain: Int, groupDomain: Int)
      : org.apache.spark.sql.DataFrame =
    (0 until n).map { i =>
      val skew = rnd.nextInt(10) == 0
      (i.toLong, // id: unique tiebreak
        (if (skew) 0 else rnd.nextInt(keyDomain)).toLong, // v: tie-heavy
        s"g${rnd.nextInt(groupDomain)}", // g: group
        rnd.nextLong() % 1000L) // w: signed weight
    }.toDF("id", "v", "g", "w")

  test("withGlobalRowNumber == window row_number on random tie-heavy data") {
    for (trial <- 1 to 4) {
      val n = 200 + rnd.nextInt(2000)
      val df = randomTable(n, keyDomain = 1 + rnd.nextInt(7), groupDomain = 3)
      val nPart = 2 + rnd.nextInt(6)
      val sort = Seq(col("v").asc, col("id").asc)
      val got = Ranked.withGlobalRowNumber(df, "rn", sort, nPart)
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      val want = df.withColumn("rn",
          row_number().over(Window.orderBy(sort: _*)).cast("long"))
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      assert(got == want, s"trial $trial (n=$n, nPart=$nPart)")
    }
  }

  test("withGroupRowNumber + countOut == partitioned window on random data") {
    for (trial <- 1 to 3) {
      val n = 200 + rnd.nextInt(1500)
      val df = randomTable(n, keyDomain = 1 + rnd.nextInt(5),
        groupDomain = 1 + rnd.nextInt(6))
      val nPart = 2 + rnd.nextInt(6)
      val sort = Seq(col("v").asc, col("id").asc)
      val got = Ranked.withGroupRowNumber(df, "rn", "g", sort, nPart,
          countOut = "cnt")
        .select($"id", $"rn", $"cnt").as[(Long, Long, Long)]
        .collect().map(t => t._1 -> ((t._2, t._3))).toMap
      val want = df
        .withColumn("rn", row_number().over(
          Window.partitionBy($"g").orderBy(sort: _*)).cast("long"))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"g")))
        .select($"id", $"rn", $"cnt").as[(Long, Long, Long)]
        .collect().map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got == want, s"trial $trial (n=$n, nPart=$nPart)")
    }
  }

  test("withGlobalRunningSum == window running sum with SIGNED values") {
    for (trial <- 1 to 3) {
      val n = 200 + rnd.nextInt(1500)
      val df = randomTable(n, keyDomain = 1 + rnd.nextInt(5), groupDomain = 2)
      val nPart = 2 + rnd.nextInt(6)
      val sort = Seq(col("v").asc, col("id").asc)
      val got = Ranked.withGlobalRunningSum(df, "run", col("w"), sort, nPart)
        .select($"id", $"run").as[(Long, Long)].collect().toMap
      val want = df.withColumn("run", sum($"w").over(Window.orderBy(sort: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"id", $"run").as[(Long, Long)].collect().toMap
      assert(got == want, s"trial $trial (n=$n, nPart=$nPart)")
    }
  }

  test("withGlobalLag/Lead == window lag/lead on random data with nulls, " +
      "offsets from 1 to beyond the table size") {
    for (trial <- 1 to 3) {
      val n = 100 + rnd.nextInt(1200)
      val df = randomTable(n, keyDomain = 1 + rnd.nextInt(6), groupDomain = 2)
        .withColumn("wn", when($"w" % 3 =!= 0, $"w")) // null-bearing value
      val nPart = 2 + rnd.nextInt(6)
      val sort = Seq(col("v").asc, col("id").asc)
      val w = Window.orderBy(sort: _*)
      // off beyond n: every value is the default
      for (off <- Seq(1, 2 + rnd.nextInt(20), n + 5)) {
        val gotLag = Ranked.withGlobalLag(df, "x", $"wn", off, lit(-7L),
            sort, nPart)
          .select($"id", $"x").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        val wantLag = df.withColumn("x", lag($"wn", off, -7L).over(w))
          .select($"id", $"x").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        assert(gotLag == wantLag, s"lag trial $trial off=$off n=$n nPart=$nPart")
        val gotLead = Ranked.withGlobalLead(df, "x", $"wn", off,
            lit(null).cast("long"), sort, nPart)
          .select($"id", $"x").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        val wantLead = df.withColumn("x", lead($"wn", off).over(w))
          .select($"id", $"x").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        assert(gotLead == wantLead,
          s"lead trial $trial off=$off n=$n nPart=$nPart")
      }
    }
  }

  test("withStrictPrecedingMax == RANGE(-inf,-1) max incl. all-ties input") {
    for (trial <- 1 to 3) {
      val n = 100 + rnd.nextInt(800)
      // keyDomain 1 on the last trial: EVERY row ties — the preceding-max
      // must be NULL/absent for all of them, not leak across the tie group
      val df = randomTable(n, keyDomain = if (trial == 3) 1 else 4,
        groupDomain = 2)
      val nPart = 2 + rnd.nextInt(6)
      val got = Ranked.withStrictPrecedingMax(df, "m", col("w"), col("v"), nPart)
        .select($"id", $"m").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val want = df.withColumn("m", max($"w").over(Window.orderBy($"v")
          .rangeBetween(Window.unboundedPreceding, -1)))
        .select($"id", $"m").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == want, s"trial $trial (n=$n, nPart=$nPart)")
    }
  }
}
