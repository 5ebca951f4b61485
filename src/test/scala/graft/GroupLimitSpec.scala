package graft

import org.apache.spark.sql.functions._

/** Pins the two spellings of GROUPED LIMIT row-identical: the SQL
  * window-filter form a DuckDB migrant writes (their `QUALIFY
  * row_number() <= k`, the q_group_limit face) and the native
  * [[graft.functions.GraftFunctions.topk_select]] partial-aggregate path
  * (per-partition k-bounded buffers, no Window exchange of the full
  * input). Same data, same ordering (o_totalprice DESC, o_orderkey ASC),
  * so the kept rows and their ranks must agree exactly — the aggregate
  * path is the 100 TB spelling (the window form shuffles every input row
  * to its group's partition; the aggregate moves k-bounded buffers). */
class GroupLimitSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_group_limit SQL window form == native topk_select aggregate path") {
    val sqlRows = SparkEntry.queries("q_group_limit")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

    // native path: topk_select keeps (value DESC, id ASC) per group —
    // exactly the face's ordering — in a map-side-combinable aggregate
    val joined = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
    val agg = joined
      .groupBy(col("c_mktsegment"))
      .agg(graft.functions.GraftFunctions.topk_select(
        struct(col("o_orderkey"), col("o_totalprice")), 3, false).as("topk"))
      .select(col("c_mktsegment"), posexplode(col("topk")).as(Seq("__r", "__s")))
      .select(col("c_mktsegment"), col("__s.vec_id").as("o_orderkey"),
        col("__s.cos").as("o_totalprice"), (col("__r") + 1).cast("long").as("rn"))
    val aggRows = agg.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

    assert(sqlRows.nonEmpty && aggRows == sqlRows)

    // and the aggregate path's plan really is aggregate-shaped: a partial
    // top-k per partition, no Window operator anywhere
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"native path must not plan a Window:\n$plan")
    assert(plan.contains("topkselect") || plan.contains("TopKSelect") ||
      plan.toLowerCase.contains("objecthashaggregate"),
      s"expected the typed top-k aggregate in:\n$plan")
  }
}
