package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkEntry registry is four maps merged with `++` — a duplicated
  * key across files would silently shadow one face (the driver would
  * never see it), and an oracle keyed to a misspelled face would
  * silently downgrade that face to rows-only. Both failure modes are
  * invisible at compile time; this spec makes them red.
  */
class RegistrySpec extends AnyFunSuite {

  test("query keys are globally unique across the four registries") {
    val maps = Seq(
      "Relational" -> graft.queries.Relational.queries.keySet,
      "XlsxQueries" -> graft.queries.XlsxQueries.queries.keySet,
      "PipelineQueries" -> graft.queries.PipelineQueries.queries.keySet,
      "ExtendedQueries" -> graft.queries.ExtendedQueries.queries.keySet)
    for (pair <- maps.combinations(2)) {
      val Seq((na, a), (nb, b)) = pair
      val shared = a & b
      assert(shared.isEmpty, s"$na and $nb both register: $shared")
    }
  }

  test("every oracle key names a registered query (no orphaned oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries with no query: $orphans")
  }

  test("the oracle-less (rows-only) set is the known engine-own family") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // every rows-only face must look like a sketch/signature/index face
    // with a *_check twin or be one of the known engine-own estimators —
    // a NEW rows-only face should be a conscious decision, not a typo
    val known = rowsOnly.filter { k =>
      k.startsWith("dd_") || k.startsWith("sim_") || k.startsWith("txt_bpe") ||
        k.startsWith("q_approx") || k.startsWith("q_sketch") ||
        k.startsWith("q_cms") || k.startsWith("q_heavy_hitters") ||
        // perceptual-hash pairs and fuzzy decontam are engine-own
        // estimators with DuckDB-verified _check twins
        k == "mm_phash_neardup" || k == "pipeline_decontam_fuzzy"
    }
    val surprises = rowsOnly -- known
    assert(surprises.isEmpty,
      s"unexpected faces without oracles (typo or missing SQL?): $surprises")
  }
}
