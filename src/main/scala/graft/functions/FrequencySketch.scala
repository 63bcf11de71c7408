package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Serialized Misra-Gries state: `counts` holds at most `k` tracked keys
  * with their (possibly discounted) counters, `n` is the true item count.
  * A plain product type so the partial-aggregate buffer rides Spark's row
  * encoder — no Kryo, no opaque binary.
  */
case class MgBuf(n: Long, counts: Map[String, Long])

/** Mergeable heavy-hitters sketch — Misra-Gries summaries with the
  * associative merge of Agarwal et al., "Mergeable Summaries" (PODS'12) —
  * as a typed [[Aggregator]]: the 100-TB frequent-items path, the same
  * role [[KllQuantilesAggregator]] plays for percentiles. An exact
  * frequency top-k (`heavy_hitters`) shuffles one row per DISTINCT key:
  * fine for sketch-table keys, unaffordable for open vocabularies. The
  * MG buffer carries at most k (key, count) entries per group however
  * many distinct keys stream through, map-side partials combine before
  * the shuffle, and merging two summaries is counter-wise addition
  * followed by the (k+1)-th-largest-counter discount — associative, so
  * any partition/merge tree yields a valid summary.
  *
  * Reduce: a tracked key increments; an untracked key occupies a free
  * slot, or — when all k slots are live — every counter decrements by 1
  * (zeros evicted, the new key absorbed), the classic MG step. Merge:
  * sum counters by key; if more than k survive, subtract the (k+1)-th
  * largest counter from all and drop the non-positive.
  *
  * Guarantees (Misra-Gries): estimates never exceed true counts, and
  * undercount at most n/(k+1) — any key with true frequency > n/(k+1)
  * is guaranteed present. While every group's distinct-key count stays
  * ≤ k, NO decrement ever fires anywhere in the merge tree and the
  * summary is EXACT regardless of partitioning — which is what
  * oracle-gates the aggregation plumbing end to end; the lossy regime
  * (bounds above, heavy-hitter retention) is spec-gated, since lossy MG
  * estimates legitimately vary with the merge tree inside the bound.
  *
  * Output: the `topN` (key, estimate) pairs by (estimate desc, key asc)
  * — a deterministic cut in the exact regime. Null keys are skipped
  * (consistent with SQL aggregate null semantics).
  */
case class HeavyHittersAggregator(k: Int, topN: Int)
    extends Aggregator[String, MgBuf, Seq[(String, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")
  require(topN >= 1 && topN <= k, s"topN must be in [1, $k], got $topN")

  override def zero: MgBuf = MgBuf(0L, Map.empty)

  override def reduce(b: MgBuf, x: String): MgBuf = {
    if (x == null) return b
    val c = b.counts
    c.get(x) match {
      case Some(v) => MgBuf(b.n + 1, c.updated(x, v + 1))
      case None if c.size < k => MgBuf(b.n + 1, c.updated(x, 1L))
      case None =>
        MgBuf(b.n + 1,
          c.iterator.flatMap { case (key, v) =>
            if (v > 1) Some(key -> (v - 1)) else None
          }.toMap)
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val summed = (a.counts.keySet ++ b.counts.keySet).iterator.map { key =>
      key -> (a.counts.getOrElse(key, 0L) + b.counts.getOrElse(key, 0L))
    }.toMap
    val trimmed =
      if (summed.size <= k) summed
      else {
        // discount by the (k+1)-th largest counter; at most k survive
        val kth = summed.valuesIterator.toArray.sortBy(-_).apply(k)
        summed.iterator.flatMap { case (key, v) =>
          if (v > kth) Some(key -> (v - kth)) else None
        }.toMap
      }
    MgBuf(a.n + b.n, trimmed)
  }

  override def finish(b: MgBuf): Seq[(String, Long)] =
    b.counts.toSeq.sortBy { case (key, v) => (-v, key) }.take(topN)

  override def bufferEncoder: Encoder[MgBuf] = ExpressionEncoder[MgBuf]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

/** Serialized count-min state: the flattened depth×width counter matrix. */
case class CmsBuf(counters: Array[Long])

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a typed
  * [[Aggregator]] — the POINT-QUERY member of the mergeable-sketch family
  * ([[HeavyHittersAggregator]] answers "which keys are frequent",
  * this answers "how frequent is THIS key" for keys chosen after the
  * scan, without keeping the keys at all). Fixed depth×width long matrix:
  * update adds 1 to one bucket per row (bucket_r(key) =
  * md5-prefix-hash32(r || ':' || key) mod width — the engine's replayable
  * hash, so an oracle can rebuild every counter in SQL); merge is
  * element-wise addition — associative, commutative, any partition tree
  * yields the same matrix. Estimates (min over rows) NEVER undercount;
  * they overcount a key by other keys' mass colliding in all `depth`
  * rows — within εn at confidence 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * Scale shape: the shuffle carries depth·width longs per group however
  * many rows stream through — the same fixed-size-exchange contract as
  * the KLL/MG/KMV members; estimation afterwards is pure projection.
  */
case class CmsAggregator(depth: Int, width: Int)
    extends Aggregator[String, CmsBuf, CmsBuf] {
  require(depth > 0 && depth <= 16, s"depth out of range: $depth")
  require(width > 1, s"width out of range: $width")

  override def zero: CmsBuf = CmsBuf(Array.emptyLongArray)

  override def reduce(b: CmsBuf, key: String): CmsBuf = {
    if (key == null) return b
    val m = if (b.counters.isEmpty) new Array[Long](depth * width)
            else b.counters
    var r = 0
    while (r < depth) {
      m(r * width + CmsAggregator.bucket(r, key, width)) += 1L
      r += 1
    }
    CmsBuf(m)
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf =
    if (a.counters.isEmpty) b
    else if (b.counters.isEmpty) a
    else {
      var i = 0
      while (i < a.counters.length) {
        a.counters(i) = math.addExact(a.counters(i), b.counters(i))
        i += 1
      }
      a
    }

  override def finish(r: CmsBuf): CmsBuf =
    if (r.counters.isEmpty) CmsBuf(new Array[Long](depth * width)) else r

  private def enc[T: TypeTag]: Encoder[T] = ExpressionEncoder[T]()
  override def bufferEncoder: Encoder[CmsBuf] = enc
  override def outputEncoder: Encoder[CmsBuf] = enc
}

object CmsAggregator {
  import java.nio.charset.StandardCharsets
  import java.security.MessageDigest

  private val tlMd5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Row-r bucket of `key`: first-8-md5-hex-digits hash of "r:key", mod
    * width — the engine's standard replayable hash
    * (`('0x' || substring(md5(r || ':' || key), 1, 8))::BIGINT % width`
    * in DuckDB), duplicated here because the JVM-side helper in
    * org.apache.spark.sql.graft is package-private there. Thread-local
    * digest: this runs depth× per input row on the corpus-sized hot
    * path, and getInstance pays a JCA provider lookup per call.
    */
  def bucket(r: Int, key: String, width: Int): Int = {
    val d = tlMd5.get(); d.reset()
    val h = d.digest((r + ":" + key).getBytes(StandardCharsets.UTF_8))
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (v % width).toInt
  }
}

object FrequencySketch {
  /** Column form: `mgTopK(k, topN)(key)` aggregates to an
    * array<struct<_1: string, _2: bigint>> of the topN estimated-count
    * pairs. Exact while each group has at most k distinct keys; otherwise
    * estimates undercount by at most n/(k+1) and every key with frequency
    * above that bound is retained.
    */
  def mgTopK(k: Int, topN: Int)(key: Column): Column =
    udaf(HeavyHittersAggregator(k, topN)).apply(key)

  /** Column form: `cms(depth, width)(key)` aggregates to
    * struct(counters: array<long>) — the flattened count-min matrix.
    */
  def cms(depth: Int, width: Int): Column => Column = {
    val f = udaf(CmsAggregator(depth, width))
    (key: Column) => f(key)
  }

  /** Point estimate for a LITERAL probe key: min over rows of the key's
    * bucket — buckets resolve at PLAN TIME (same md5 the executor-side
    * update uses), so the estimate is a pure element_at projection.
    *
    * `counters` must be the flattened array<long> matrix — i.e. the
    * `.counters` field of what [[cms]] aggregates to, not the struct
    * itself (element_at on the struct fails analysis). Pass
    * `cmsCol.getField("counters")` when holding the aggregator output.
    */
  def cmsEstimate(counters: Column, key: String, depth: Int,
      width: Int): Column = {
    val cells = (0 until depth).map(r =>
      org.apache.spark.sql.functions.element_at(counters,
        r * width + CmsAggregator.bucket(r, key, width) + 1))
    // least() rejects a single argument — a depth-1 sketch is valid
    if (cells.size == 1) cells.head
    else org.apache.spark.sql.functions.least(cells: _*)
  }
}
