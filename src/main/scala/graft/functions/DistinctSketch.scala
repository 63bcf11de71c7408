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

/** Serialized counted-KMV state: `baseH`/`baseC` are the at-most-k
  * smallest distinct hashes (sorted) with their occurrence counts;
  * `spill` is the unsorted append run (weight 1 each) awaiting
  * compaction — same amortization as [[KmvBuf]].
  */
case class KmvCntBuf(baseH: Seq[Long], baseC: Seq[Long], spill: Seq[Long])

/** Counted K-Minimum-Values — the KMV synopsis with an occurrence count
  * riding on each tracked hash: correlated sampling for JOIN-SIZE
  * estimation (Vengerov et al., VLDB'15 shape). Both join sides sample
  * the SAME keys (those hashing below θ), so
  * Σ cA(h)·cB(h) over common tracked hashes, scaled by 2^32/θ, estimates
  * |A ⋈ B| — the pre-flight diagnostic that tells you a join will
  * explode BEFORE you pay its shuffle ([[graft.operators.Diagnostics
  * .joinSizeEstimate]]); independent uniform samples of two tables
  * almost never collide on the join key, which is why the shared-hash
  * trick beats row sampling for this.
  *
  * Count exactness: a key that SURVIVES to the final sketch was never
  * rejected at any reduce (the admission bound is the running k-th
  * minimum, which only decreases — a surviving key sits below the final
  * bound, hence below every earlier one), and a merge can only drop a
  * key entirely (if one side rejected it, that side owns k smaller keys
  * and the merged trim discards it), never keep it with a partial
  * count. So surviving counts are exact over ANY partition/merge tree —
  * which is what lets the exact regime reproduce true join sizes
  * bit-for-bit for the oracle.
  */
case class KmvCountedAggregator(k: Int)
    extends Aggregator[Long, KmvCntBuf, Seq[(Long, Long)]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: KmvCntBuf = KmvCntBuf(Vector.empty, Vector.empty, Vector.empty)

  override def reduce(b: KmvCntBuf, x: Long): KmvCntBuf = {
    require(x >= 0, s"kmv input must be a non-negative hash, got $x")
    if (b.baseH.size >= k) {
      val last = b.baseH.last
      if (x > last) return b
      if (x == last)
        return KmvCntBuf(b.baseH,
          b.baseC.updated(b.baseC.size - 1, b.baseC.last + 1), b.spill)
    }
    val spilled = KmvCntBuf(b.baseH, b.baseC, b.spill :+ x)
    if (spilled.spill.size >= k) compact(spilled) else spilled
  }

  override def merge(a: KmvCntBuf, b: KmvCntBuf): KmvCntBuf = {
    val ca = compact(a)
    val cb = compact(b)
    if (ca.baseH.isEmpty) return cb
    if (cb.baseH.isEmpty) return ca
    val hs = Vector.newBuilder[Long]
    val cs = Vector.newBuilder[Long]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < ca.baseH.size || j < cb.baseH.size)) {
      if (j >= cb.baseH.size || (i < ca.baseH.size && ca.baseH(i) < cb.baseH(j))) {
        hs += ca.baseH(i); cs += ca.baseC(i); i += 1
      } else if (i >= ca.baseH.size || cb.baseH(j) < ca.baseH(i)) {
        hs += cb.baseH(j); cs += cb.baseC(j); j += 1
      } else {
        hs += ca.baseH(i); cs += ca.baseC(i) + cb.baseC(j); i += 1; j += 1
      }
      n += 1
    }
    KmvCntBuf(hs.result(), cs.result(), Vector.empty)
  }

  override def finish(b: KmvCntBuf): Seq[(Long, Long)] = {
    val c = compact(b)
    c.baseH.zip(c.baseC)
  }

  /** Sort the (hash, count) pairs with the weight-1 spill appended,
    * sum counts per hash in one merge pass, trim to the k smallest.
    */
  private def compact(b: KmvCntBuf): KmvCntBuf = {
    if (b.spill.isEmpty) return b
    val m = b.baseH.size + b.spill.size
    val hs = new Array[Long](m)
    val cs = new Array[Long](m)
    var i = 0
    while (i < b.baseH.size) { hs(i) = b.baseH(i); cs(i) = b.baseC(i); i += 1 }
    var j = 0
    while (j < b.spill.size) { hs(i) = b.spill(j); cs(i) = 1L; i += 1; j += 1 }
    val order = Array.range(0, m).sortBy(hs)
    val outH = Vector.newBuilder[Long]
    val outC = Vector.newBuilder[Long]
    var n = 0
    var p = 0
    while (p < m && n < k) {
      val h = hs(order(p))
      var c = 0L
      while (p < m && hs(order(p)) == h) { c += cs(order(p)); p += 1 }
      outH += h; outC += c; n += 1
    }
    KmvCntBuf(outH.result(), outC.result(), Vector.empty)
  }

  override def bufferEncoder: Encoder[KmvCntBuf] = ExpressionEncoder[KmvCntBuf]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object DistinctSketch {
  /** The hash domain size: [[TextFunctions.hash32]] values lie in [0, 2^32). */
  val HashDomain: Double = 4294967296.0

  /** Column form: `kmv(k)(hash)` aggregates pre-hashed longs to the sorted
    * array<bigint> of the k smallest distinct values. Pair with
    * [[estimate]] / [[unionSketch]] for cardinality and overlap algebra.
    */
  def kmv(k: Int)(hash: Column): Column = udaf(KmvAggregator(k)).apply(hash)

  /** Counted form: `kmvCounted(k)(hash)` aggregates to an
    * array<struct<_1: hash, _2: count>> of the k smallest distinct hashes
    * with exact occurrence counts — the join-size-estimation synopsis.
    */
  def kmvCounted(k: Int)(hash: Column): Column =
    udaf(KmvCountedAggregator(k)).apply(hash)

  /** Distinct-count estimate from a sketch: exact size while unsaturated,
    * else the KMV estimator (k-1) / U_(k) with U normalized to [0,1] —
    * i.e. (k-1) · 2^32 / kth-minimum. One double division, so engines
    * replaying the same hashes agree bit-for-bit.
    */
  def estimate(k: Int, sk: Column): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1) * HashDomain) /
        element_at(sk, size(sk)).cast("double"))

  /** Driver-side form of [[estimate]] for collected sketches (one
    * formula, two access paths — keep them from drifting): exact size
    * while unsaturated, else (k-1) · 2^32 / kth-minimum.
    */
  def estimateLocal(k: Int, size: Int, kthMin: Long): Double =
    if (size < k) size.toDouble else (k - 1) * HashDomain / kthMin.toDouble

  /** The k smallest distinct hashes of A ∪ B, computed from the two
    * sketches alone — itself a valid KMV sketch of the union (closure
    * under union is what makes KMV an overlap sketch, not just a counter).
    */
  def unionSketch(k: Int, a: Column, b: Column): Column =
    slice(array_sort(array_union(a, b)), 1, k)
}
