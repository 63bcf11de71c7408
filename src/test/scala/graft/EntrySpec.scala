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

  test("every declared query is oracle-checked — the allowlist is empty") {
    // Since round 6 the two former rows-only entries (sim_ivf_trained,
    // bpe_tokenize) inject their trained artifacts from PinnedArtifacts,
    // so their post-training math is oracle-replayable like everything
    // else. Round 13 closed the last gap: mm_phash_pairs pins its
    // javax.imageio decode results (PinnedArtifacts.MmFixtureHashes64,
    // decode→pin equality asserted per image in MultimodalSpec) and the
    // oracle replays the Hamming-radius pair join over the pinned 64-bit
    // values — so EVERY registry entry is now hash-gated.
    val weak = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(weak.isEmpty, s"queries without oracle SQL: $weak")
  }
}
