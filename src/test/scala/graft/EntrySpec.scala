package graft

import graft.SparkSpec

/** Pins the driver contract: entry() yields rows on the smoke SF, every
  * oracle key has a query, names are unique, and all declared queries build
  * a plan against the smallest dataset (catching eager driver-side failures
  * without paying 44 executions here — Verify covers execution).
  */
class EntrySpec extends SparkSpec {

  test("entry() returns rows at sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys; names unique") {
    val qs = SparkEntry.allQueries.map(_.name)
    assert(qs.distinct.size === qs.size, "duplicate query names")
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every declared query is oracle-checked, except the explicit " +
      "pixel-decode allowlist") {
    // Since round 6 the two former rows-only entries (sim_ivf_trained,
    // bpe_tokenize) inject their trained artifacts from PinnedArtifacts,
    // so their post-training math is oracle-replayable like everything
    // else. Round 10 adds exactly ONE genuinely non-replayable entry:
    // mm_phash_pairs hashes REAL javax.imageio-decoded pixels, which no
    // SQL engine can reproduce (its semantics are spec-gated in
    // MultimodalSpec). The allowlist is exact-equality, so any
    // accidentally oracle-less query still fails here.
    val allowedRowsOnly = Set("mm_phash_pairs")
    val weak = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(weak == allowedRowsOnly,
      s"queries without oracle SQL beyond the allowlist: ${weak -- allowedRowsOnly}")
  }
}
