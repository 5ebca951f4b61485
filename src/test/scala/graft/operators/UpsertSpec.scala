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
}
