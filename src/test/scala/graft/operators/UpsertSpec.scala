package graft.operators

import graft.SparkSpec

/** MERGE semantics: matched overwrite (including SET NULL), partial
  * update columns, insert of unmatched updates, carry-over of unmatched
  * target rows. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: overwrite, set-null, partial columns, insert, carry-over") {
    val target = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(20.0)),
      (3L, Some("c"), Some(30.0))
    ).toDF("k", "s", "x")
    // updates carry only (k, s): x must survive even on matched rows;
    // k=2 legitimately sets s to NULL; k=9 is an insert
    val updates = Seq(
      (2L, None: Option[String]),
      (3L, Some("C")),
      (9L, Some("z"))
    ).toDF("k", "s")
    val out = Upsert.upsert(target, updates, Seq("k"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some("a"), Some(10.0)),   // untouched carry-over
      (2L, None, Some(20.0)),        // matched: s SET NULL, x kept
      (3L, Some("C"), Some(30.0)),   // matched: s overwritten, x kept
      (9L, Some("z"), None)))        // insert: absent column is NULL
  }

  test("upsert plan: one full-outer join, no extra shuffle of the target") {
    val target = Seq((1L, "a")).toDF("k", "s")
    val updates = Seq((1L, "A")).toDF("k", "s")
    val df = Upsert.upsert(target, updates, Seq("k"))
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType.sql
    }
    assert(joins == Seq("FULL OUTER"))
  }

  test("diff classifies added/removed/changed/same with null-safe compares") {
    val v1 = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("d"))).toDF("k", "s")
    val v2 = Seq(
      (1L, Some("a")),                       // same
      (2L, Some("B")),                       // changed
      (3L, Some("c")),                       // changed (null -> value)
      (5L, Some("e"))).toDF("k", "s")        // added; 4 removed
    val got = Upsert.diff(v1, v2, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "same", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    val joins = Upsert.diff(v1, v2, Seq("k")).queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType.sql
    }
    assert(joins == Seq("FULL OUTER"))
  }

  test("upsertVersioned against a bucketed state: only the delta shuffles") {
    import org.apache.spark.sql.functions._
    val wh = java.nio.file.Files.createTempDirectory("graft_cdc_").toString
    val state = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "p")
    state.write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$wh/cdc_state").mode("overwrite")
      .saveAsTable("cdc_state")
    val delta = Seq((2L, 25L, "B"), (4L, 5L, "d")).toDF("k", "v", "p")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val next = Upsert.upsertVersioned(
        spark.table("cdc_state"), delta, Seq("k"), Seq("v"))
      val got = next.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
      // the CDC-at-scale point: the accumulated state reads pre-bucketed
      // into the join — the only Exchange in the plan is the delta's
      val plan = next.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected 1 exchange (delta side only):\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS cdc_state")
    }
  }

  test("upsertVersioned: stale updates lose; apply order cannot change the result") {
    // state rows are (k, v1, v2, payload); version = (v1, v2)
    val updates = Seq(
      (1L, 3L, 1L, "newest-1"),
      (1L, 2L, 9L, "stale-1"),
      (2L, 5L, 2L, "newest-2"),
      (2L, 5L, 1L, "older-2"),  // v1 ties, v2 decides
      (3L, 1L, 1L, "only-3"))
    val schema = Seq("k", "v1", "v2", "p")
    val empty = Seq.empty[(Long, Long, Long, String)].toDF(schema: _*)
    def reduce(batch: Seq[(Long, Long, Long, String)]) = {
      import org.apache.spark.sql.functions._
      batch.toDF(schema: _*).groupBy(col("k"))
        .agg(max(struct(col("v1"), col("v2"), col("p"))).as("m"))
        .select(col("k"), col("m.v1").as("v1"), col("m.v2").as("v2"),
          col("m.p").as("p"))
    }
    def applyAll(batches: Seq[Seq[(Long, Long, Long, String)]]) =
      batches.foldLeft(empty) { (state, b) =>
        Upsert.upsertVersioned(state, reduce(b), Seq("k"), Seq("v1", "v2"))
      }.collect().map(r => (r.getLong(0), r.getString(3))).toSet
    val expected = Set((1L, "newest-1"), (2L, "newest-2"), (3L, "only-3"))
    // one batch, row-per-batch in order, and in REVERSE order all agree
    assert(applyAll(Seq(updates)) == expected)
    assert(applyAll(updates.map(Seq(_))) == expected)
    assert(applyAll(updates.reverse.map(Seq(_))) == expected)
  }
}
