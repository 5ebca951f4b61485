package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters aggregate: exact regime (domain <= k), the
  * classic presence/undercount guarantees under trims, and distributed
  * merge correctness. */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: DataFrame, k: Int): (Seq[(String, Long)], Long) = {
    val row = df.agg(GraftFunctions.mg_freq_items(col("tok"), k).as("sk"))
      .select(col("sk.items"), col("sk.err_bound")).collect()(0)
    val items = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
    (items, row.getLong(1))
  }

  private def exactCounts(df: DataFrame): Map[String, Long] =
    df.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime: domain <= k reproduces the groupBy counts, err_bound 0") {
    val toks = Seq.tabulate(1000)(i => s"w${i % 17}").toDF("tok").repartition(8)
    val (items, err) = sketch(toks, 64)
    assert(err == 0L)
    assert(items.toMap == exactCounts(toks))
    // rank order is (est desc, item asc)
    assert(items == items.sortBy { case (item, est) => (-est, item) })
  }

  test("trim regime: every item above n/(k+1) is present, estimates undercount by <= err_bound") {
    // 4 heavy items (200 each) in a sea of 400 singletons; k=16 forces
    // trims. n = 1200, n/(k+1) ~ 70 << 200 so the heavies must survive.
    val rows = (1 to 4).flatMap(h => Seq.fill(200)(s"heavy$h")) ++
      (1 to 400).map(i => s"rare$i")
    val toks = rows.toDF("tok").repartition(8)
    val truth = exactCounts(toks)
    val (items, err) = sketch(toks, 16)
    assert(items.size <= 16)
    assert(err <= 1200L / 17L + 1L)
    val est = items.toMap
    for (h <- 1 to 4) {
      val name = s"heavy$h"
      assert(est.contains(name), s"$name lost despite freq 200 > n/(k+1)")
      assert(est(name) <= truth(name) && est(name) >= truth(name) - err,
        s"$name estimate ${est(name)} outside [${truth(name) - err}, ${truth(name)}]")
    }
    // no estimate may ever exceed its true count (MG never overcounts)
    items.foreach { case (item, e) => assert(e <= truth(item)) }
  }

  test("merge regime: per-partition heavies disjoint across 8 partitions all survive") {
    // each partition holds one dominant item; the merged sketch must keep
    // all 8 dominants within bound even though each partial buffer never
    // saw the others
    val rows = (0 until 8).flatMap { p =>
      Seq.fill(300)(s"dom$p") ++ (1 to 100).map(i => s"noise${p}_$i")
    }
    val toks = spark.createDataset(rows).toDF("tok")
      .repartition(8, col("tok")) // co-locate each item; buffers differ per partition
    val truth = exactCounts(toks)
    val (items, err) = sketch(toks, 32)
    val est = items.toMap
    assert(err <= (rows.size.toLong / 33L) + 1L)
    for (p <- 0 until 8) {
      val name = s"dom$p"
      assert(est.contains(name) && est(name) <= truth(name) && est(name) >= truth(name) - err)
    }
  }

  test("q_heavy_hitters face: exact regime on the real corpus (err_bound 0, top-20)") {
    val df = graft.SparkEntry.queries("q_heavy_hitters")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getLong(3) == 0L), "trim fired on a 31-word vocabulary")
    val ests = rows.sortBy(_.getLong(2)).map(_.getLong(1))
    assert(ests.sameElements(ests.sortBy(-_: Long)), "ranks not in est-desc order")
  }
}
