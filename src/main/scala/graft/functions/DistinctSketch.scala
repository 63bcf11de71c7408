package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Serialized KMV state. `base` holds at most `k` of the smallest DISTINCT
  * hash values seen so far, sorted ascending; `spill` is an unsorted
  * append-only run of admitted values not yet folded in (each < the
  * current admission bound, possibly duplicated). Compaction merges the
  * two every ~k appends, so a reduce is an O(1) append + amortized
  * O(log k) share of the periodic sort — NOT an O(k) sorted-vector insert
  * per row, which is what makes the growth phase affordable (a saturating
  * group pays O(n log k), not O(n·k)). A plain product type so the
  * partial-aggregate buffer rides Spark's row encoder — no Kryo, no
  * opaque binary.
  */
case class KmvBuf(base: Seq[Long], spill: Seq[Long])

/** Mergeable distinct-count / set-overlap sketch — K-Minimum-Values (Bar-
  * Yossef et al., RANDOM'02; set operations per Beyer et al., SIGMOD'07) as
  * a typed [[Aggregator]]: the 100-TB distinct-cardinality-AND-overlap
  * path, completing the sketch family ([[KllQuantilesAggregator]] for
  * quantiles, [[HeavyHittersAggregator]] for frequent items). HLL
  * (`approx_count_distinct`, oracle-gated in `hll_cardinality`) estimates
  * UNION cardinalities only; a KMV synopsis additionally supports
  * intersection/Jaccard between groups — the "how much does corpus A
  * overlap corpus B" question behind dedup planning and contamination
  * budgeting — because the k smallest hashes of A ∪ B are computable from
  * the two sketches alone, and the shared-hash fraction within that set is
  * an unbiased Jaccard estimator.
  *
  * The input is an already-hashed 32-bit value in a long (the
  * [[TextFunctions.hash32]] md5 prefix — the same replayable hash the
  * sampling operators use), so the sketch itself is hash-agnostic
  * plumbing. A new value ≥ the current k-th-minimum bound is rejected in
  * O(1) — once saturated, most inputs short-circuit there. Merging two
  * sketches is a sorted merge keeping the k smallest distinct —
  * associative and commutative, so any partition/merge tree yields the
  * same buffer, and the shuffle carries at most ~2k longs per group
  * however many rows stream through.
  *
  * While a group's distinct-hash count stays ≤ k the sketch IS the exact
  * distinct-hash set regardless of partitioning — which is what
  * oracle-gates the plumbing end to end (DuckDB replays md5-prefix hashing
  * bit-for-bit); the lossy regime (relative error ~1/sqrt(k-2) on the
  * (k-1)/U_(k) estimator) is spec-gated in DistinctSketchSpec.
  *
  * Negative inputs are rejected (the estimator needs the [0, 2^32) hash
  * domain); nulls never reach the reducer (Spark skips null inputs to
  * typed aggregators over primitive columns).
  */
case class KmvAggregator(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: KmvBuf = KmvBuf(Vector.empty, Vector.empty)

  override def reduce(b: KmvBuf, x: Long): KmvBuf = {
    require(x >= 0, s"kmv input must be a non-negative hash, got $x")
    // admission bound: only meaningful once base saturated; spill may
    // lower the true k-th minimum, but admitting against the stale bound
    // is still correct (a superset survives to the next compaction)
    if (b.base.size >= k && x >= b.base.last) return b
    val spilled = KmvBuf(b.base, b.spill :+ x)
    if (spilled.spill.size >= k) compact(spilled) else spilled
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    val ca = compact(a)
    val cb = compact(b)
    if (ca.base.isEmpty) return cb
    if (cb.base.isEmpty) return ca
    val out = Vector.newBuilder[Long]
    var i = 0
    var j = 0
    var n = 0
    val av = ca.base
    val bv = cb.base
    while (n < k && (i < av.size || j < bv.size)) {
      val take =
        if (i >= av.size) { val v = bv(j); j += 1; v }
        else if (j >= bv.size) { val v = av(i); i += 1; v }
        else if (av(i) < bv(j)) { val v = av(i); i += 1; v }
        else if (av(i) > bv(j)) { val v = bv(j); j += 1; v }
        else { val v = av(i); i += 1; j += 1; v }
      out += take
      n += 1
    }
    KmvBuf(out.result(), Vector.empty)
  }

  override def finish(b: KmvBuf): Seq[Long] = compact(b).base

  /** Fold the spill into the sorted base: one sort + dedup-merge pass,
    * then trim to the k smallest.
    */
  private def compact(b: KmvBuf): KmvBuf = {
    if (b.spill.isEmpty) return b
    val all = (b.base ++ b.spill).toArray
    java.util.Arrays.sort(all)
    val out = Vector.newBuilder[Long]
    var i = 0
    var n = 0
    var prev = -1L
    while (i < all.length && n < k) {
      val v = all(i)
      if (v != prev) { out += v; n += 1; prev = v }
      i += 1
    }
    KmvBuf(out.result(), Vector.empty)
  }

  override def bufferEncoder: Encoder[KmvBuf] = ExpressionEncoder[KmvBuf]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object DistinctSketch {
  /** The hash domain size: [[TextFunctions.hash32]] values lie in [0, 2^32). */
  val HashDomain: Double = 4294967296.0

  /** Column form: `kmv(k)(hash)` aggregates pre-hashed longs to the sorted
    * array<bigint> of the k smallest distinct values. Pair with
    * [[estimate]] / [[unionSketch]] for cardinality and overlap algebra.
    */
  def kmv(k: Int)(hash: Column): Column = udaf(KmvAggregator(k)).apply(hash)

  /** Distinct-count estimate from a sketch: exact size while unsaturated,
    * else the KMV estimator (k-1) / U_(k) with U normalized to [0,1] —
    * i.e. (k-1) · 2^32 / kth-minimum. One double division, so engines
    * replaying the same hashes agree bit-for-bit.
    */
  def estimate(k: Int, sk: Column): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1) * HashDomain) /
        element_at(sk, size(sk)).cast("double"))

  /** The k smallest distinct hashes of A ∪ B, computed from the two
    * sketches alone — itself a valid KMV sketch of the union (closure
    * under union is what makes KMV an overlap sketch, not just a counter).
    */
  def unionSketch(k: Int, a: Column, b: Column): Column =
    slice(array_sort(array_union(a, b)), 1, k)
}
