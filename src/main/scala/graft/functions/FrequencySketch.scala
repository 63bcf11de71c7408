package graft.functions

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

object FrequencySketch {
  /** Column form: `mgTopK(k, topN)(key)` aggregates to an
    * array<struct<_1: string, _2: bigint>> of the topN estimated-count
    * pairs. Exact while each group has at most k distinct keys; otherwise
    * estimates undercount by at most n/(k+1) and every key with frequency
    * above that bound is retained.
    */
  def mgTopK(k: Int, topN: Int)(key: Column): Column =
    udaf(HeavyHittersAggregator(k, topN)).apply(key)
}
