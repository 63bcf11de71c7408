package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Serialized KLL state: `levels(h)` holds items of weight 2^h, `parity`
  * drives the deterministic compaction offset, `n` is the true item count.
  * A plain product type so the partial-aggregate buffer rides Spark's row
  * encoder — no Kryo, no opaque binary.
  */
case class KllBuf(n: Long, parity: Boolean, levels: Seq[Seq[Double]])

/** Mergeable quantile sketch — a deterministic variant of KLL (Karnin,
  * Lang & Liberty, "Optimal Quantile Approximation in Streams", FOCS'16)
  * as a typed [[Aggregator]]: the 100-TB percentile path where the exact
  * `percentile_disc` plan (a full sort of every group) stops being
  * affordable. The partial buffer carries O(k·log(n/k)) doubles per group
  * instead of the group's whole column, map-side partials combine before
  * the shuffle, and merging two sketches is level-wise concatenation plus
  * re-compaction — associative, so any partition/merge tree gives a valid
  * summary (the mergeable-summaries property approx_percentile's
  * Greenwald-Khanna history lacks natively; Spark grafts merge onto GK —
  * reference stance: configs.properties:10-11 partial-agg discipline).
  *
  * Level h items carry weight 2^h. Compacting a level sorts it, promotes
  * every other item (alternating start offset — deterministic, unlike the
  * paper's coin flip — odd tail item stays behind at its own level), and
  * discards the rest; capacities decay geometrically (2/3) below the top
  * level, giving the paper's O(k·sqrt(log(n/k))) space and ~O(1/k)
  * rank-error regime. While n ≤ the aggregate capacity NO compaction ever
  * fires and the sketch is EXACT — rank-selection then reproduces
  * `percentile_disc` bit-for-bit regardless of partitioning or merge
  * order, which is what oracle-gates the plumbing end to end; the lossy
  * regime is spec-gated (rank-error bound, merge associativity).
  *
  * Quantile rule: smallest value whose cumulative relative weight
  * `cum/n ≥ p` under DOUBLE division — the exact cume_dist comparison
  * Spark's `percentile_disc` evaluates (a ceil(p·n) formulation is off by
  * one when p·n is integral in decimal but not in binary, e.g.
  * 0.9 × 3000), so the exact regime reproduces `percentile_disc` and
  * DuckDB's `quantile_disc` bit-for-bit. NaN inputs are skipped (a NaN
  * would poison the sort order); nulls never reach the reducer (Spark
  * skips null inputs to typed aggregators over primitive columns).
  */
case class KllQuantilesAggregator(k: Int, probs: Seq[Double])
    extends Aggregator[Double, KllBuf, Seq[Double]] {
  require(k >= 8, s"k must be >= 8, got $k")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probs must lie in [0,1], got $probs")

  private val decay = 2.0 / 3.0

  /** Capacity of level h when `numLevels` levels exist (top level = k). */
  private def cap(h: Int, numLevels: Int): Int =
    math.max(2, math.ceil(k * math.pow(decay, (numLevels - 1 - h).toDouble)).toInt)

  private def totalCap(numLevels: Int): Int =
    (0 until numLevels).map(cap(_, numLevels)).sum

  override def zero: KllBuf = KllBuf(0L, parity = false, Seq(Vector.empty))

  override def reduce(b: KllBuf, x: Double): KllBuf = {
    if (x.isNaN) return b
    val levels = b.levels.updated(0, b.levels.head :+ x)
    compress(KllBuf(b.n + 1, b.parity, levels))
  }

  override def merge(a: KllBuf, b: KllBuf): KllBuf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val h = math.max(a.levels.length, b.levels.length)
    val merged = (0 until h).map { i =>
      val av = if (i < a.levels.length) a.levels(i) else Vector.empty
      val bv = if (i < b.levels.length) b.levels(i) else Vector.empty
      av ++ bv
    }
    compress(KllBuf(a.n + b.n, a.parity ^ b.parity, merged))
  }

  /** Compact lowest over-capacity levels until the sketch fits. Promoting
    * every other sorted item halves the level and doubles its weight; an
    * odd straggler keeps its level so total weight is always preserved.
    */
  private def compress(b0: KllBuf): KllBuf = {
    var b = b0
    var size = b.levels.iterator.map(_.size).sum
    while (size > totalCap(b.levels.length)) {
      val nl = b.levels.length
      // lowest level at-or-over its capacity; fall back to the fullest
      val h = (0 until nl).find(i => b.levels(i).size >= cap(i, nl))
        .getOrElse((0 until nl).maxBy(b.levels(_).size))
      val sorted = b.levels(h).sorted
      val evenCount = sorted.length - (sorted.length % 2)
      val offset = if (b.parity) 1 else 0
      val promoted = (offset until evenCount by 2).map(sorted)
      val leftover: Seq[Double] =
        if (evenCount < sorted.length) Vector(sorted.last) else Vector.empty
      val withRoom =
        if (h + 1 < nl) b.levels
        else b.levels :+ Vector.empty[Double]
      val next = withRoom
        .updated(h, leftover)
        .updated(h + 1, withRoom(h + 1) ++ promoted)
      b = KllBuf(b.n, !b.parity, next)
      size = next.iterator.map(_.size).sum
    }
    b
  }

  override def finish(b: KllBuf): Seq[Double] = {
    if (b.n == 0) return probs.map(_ => Double.NaN)
    // weighted rank-select over the merged levels
    val items = b.levels.iterator.zipWithIndex.flatMap { case (lv, h) =>
      val w = 1L << h
      lv.iterator.map(v => (v, w))
    }.toArray.sortBy(_._1)
    val totalW = items.iterator.map(_._2).sum.toDouble
    probs.map { p =>
      var cum = 0L
      var i = 0
      var res = items.last._1
      var found = false
      while (i < items.length && !found) {
        cum += items(i)._2
        if (cum.toDouble / totalW >= p) { res = items(i)._1; found = true }
        i += 1
      }
      res
    }
  }

  override def bufferEncoder: Encoder[KllBuf] = ExpressionEncoder[KllBuf]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

object QuantileSketch {
  /** Column form: `kllQuantiles(k, probs)(x)` aggregates to an
    * array<double> of discrete-quantile estimates, one per prob. Callers
    * filter nulls; NaNs are skipped inside the sketch.
    */
  def kllQuantiles(k: Int, probs: Seq[Double])(x: Column): Column =
    udaf(KllQuantilesAggregator(k, probs)).apply(x)
}
