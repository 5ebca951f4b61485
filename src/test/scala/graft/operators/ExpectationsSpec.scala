package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Declarative expectations: each rule type counts exactly its planted
  * violations, and the row-level family shares one aggregate scan. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private val df = Seq(
    // (id, qty, flag, fk)
    (Some(1L), Some(5.0), Some("A"), Some(10L)),
    (Some(2L), Some(500.0), Some("N"), Some(20L)), // qty out of range
    (None: Option[Long], Some(3.0), Some("R"), Some(10L)), // null id
    (Some(4L), None: Option[Double], Some("X"), Some(99L)), // bad flag, dangling fk
    (Some(4L), Some(7.0), None: Option[String], None: Option[Long]) // dup id
  ).toDF("id", "qty", "flag", "fk")

  private val ref = Seq(10L, 20L, 30L).toDF("ref_id")

  test("each rule type counts exactly its planted violations") {
    val out = check(df, Seq(
      NotNull("id"),
      InRange("qty", 0.0, 100.0),
      InSet("flag", Seq("A", "N", "R")),
      Satisfies("positive_qty", "qty > 0"),
      Unique(Seq("id")),
      RefIntegrity("fk", ref, "ref_id")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("not_null(id)") == ((1L, false)))
    assert(out("in_range(qty,0.0,100.0)") == ((1L, false))) // null qty doesn't violate
    assert(out("in_set(flag)") == ((1L, false))) // null flag doesn't violate
    // null qty fails the predicate (coalesce to false) → 1 + none others
    assert(out("satisfies(positive_qty)") == ((1L, false)))
    // two rows share id=4 → 1 extra row; the single null id is its own
    // group and contributes no extras
    assert(out("unique(id)") == ((1L, false)))
    assert(out("ref_integrity(fk)") == ((1L, false))) // 99 dangling; null fk exempt
  }

  test("an all-clean table passes every rule") {
    val clean = Seq((1L, 2.0, "A", 10L), (2L, 3.0, "N", 20L)).toDF("id", "qty", "flag", "fk")
    val out = check(clean, Seq(
      NotNull("id"), InRange("qty", 0.0, 100.0), InSet("flag", Seq("A", "N")),
      Unique(Seq("id")), RefIntegrity("fk", ref, "ref_id")))
    assert(out.collect().forall(r => r.getLong(1) == 0L && r.getBoolean(2)))
  }

  test("row-level rules share one aggregate scan") {
    val out = check(df, Seq(
      NotNull("id"), InRange("qty", 0.0, 100.0), InSet("flag", Seq("A")),
      Satisfies("p", "qty > 0")))
    // the only aggregates in the plan belong to the single shared pass:
    // one partial + one final over the same scan
    val scans = out.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r if r.getClass.getSimpleName.contains("Relation") => r
    }
    assert(scans.size == 1, s"row-level rules must share one scan, got ${scans.size}")
  }
}
