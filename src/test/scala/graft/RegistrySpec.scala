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

  test("the oracle-less (rows-only) set is EXACTLY the frozen engine-own list") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // FROZEN enumeration, not family prefixes: a future dd_*/sim_* face
    // whose oracle key is misspelled is exactly the failure mode this
    // spec guards against, and a prefix allowlist would wave it through
    // (r11 ADVICE). Adding a new engine-own face is a conscious edit of
    // this set — each member must carry an oracle-green *_check twin.
    val frozen = Set(
      "dd_minhash_lsh", "dd_simhash", "dd_embed_neardup", "dd_semdedup",
      "dd_cluster_lsh", "dd_minhash_incremental", "dd_simhash_incremental",
      "sim_topk_lsh", "sim_topk_ivf", "sim_topk_pq", "sim_topk_ivfpq",
      "sim_topk_ivf_indexed", "sim_topk_ivfpq_indexed", "emb_pca",
      "txt_bpe", "q_approx_distinct", "q_approx_percentile",
      "q_sketch_union", "q_cms", "q_heavy_hitters_big",
      "mm_phash_neardup", "pipeline_decontam_fuzzy",
      // r14: the persisted-IVF composition family — each certified by an
      // oracle-green *_check twin (recall / exclusion-soundness)
      "pipeline_hard_negatives_ivf", "pipeline_contrastive_ivf",
      "st_sim_topk_indexed",
      // r14 third wave: the purged-index probes — each certified by a
      // recall + purge-contract check twin
      "sim_topk_ivf_forgotten", "dd_minhash_forgotten",
      // r17: signature-only Jaccard estimates — certified by the
      // mean-abs-error/bias check twin against exact Jaccard
      "dd_minhash_estimate")
    assert(rowsOnly == frozen,
      s"rows-only drift — new without oracle (typo or missing SQL?): " +
        s"${rowsOnly -- frozen}; frozen but now has an oracle (prune the " +
        s"set): ${frozen -- rowsOnly}")
  }
}
