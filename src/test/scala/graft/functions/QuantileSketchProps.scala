package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the KLL quantile summary under arbitrary
  * partitionings — the properties Spark relies on when it partial-
  * aggregates map-side and merges shuffle buffers in any order. The
  * lossy regime's estimates legitimately vary with the merge tree
  * (inside the rank-error bound, spec-gated in QuantileSketchSpec), so
  * the properties here are the ones that hold for EVERY tree: exact-
  * regime equality, weight preservation, element provenance, and
  * monotonicity.
  */
object QuantileSketchProps extends Properties("QuantileSketch") {

  private val valGen: Gen[Double] =
    Gen.chooseNum(-1000, 1000).map(_.toDouble / 8.0)
  private val streamGen: Gen[List[Double]] = Gen.listOf(valGen)
  private val probsGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0, 100).map(_ / 100.0))

  private def foldParts(agg: KllQuantilesAggregator,
      parts: Seq[Seq[Double]]): KllBuf =
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)

  /** The exact quantile rule the aggregator implements: smallest value
    * whose cumulative relative weight >= p under double division.
    */
  private def disc(sorted: Vector[Double], p: Double): Double = {
    val n = sorted.size.toDouble
    sorted.zipWithIndex
      .collectFirst { case (v, i) if (i + 1).toDouble / n >= p => v }
      .getOrElse(sorted.last)
  }

  property("exact regime: any partitioning reproduces the discrete " +
      "quantile rule bit-for-bit") =
    forAll(Gen.listOf(streamGen), probsGen) { (parts, probs) =>
      val all = parts.flatten
      (all.size > 80) || {
        val agg = KllQuantilesAggregator(k = 128, probs)
        val got = agg.finish(foldParts(agg, parts))
        if (all.isEmpty) got.forall(_.isNaN)
        else {
          val sorted = all.sorted.toVector
          got == probs.map(disc(sorted, _))
        }
      }
    }

  property("weight preservation: total item weight across levels always " +
      "equals n, any partitioning, both regimes") =
    forAll(Gen.chooseNum(8, 24), Gen.listOf(streamGen)) { (k, parts) =>
      val agg = KllQuantilesAggregator(k, Seq(0.5))
      val buf = foldParts(agg, parts)
      val weight = buf.levels.zipWithIndex
        .map { case (lv, h) => lv.size.toLong << h }.sum
      weight == parts.flatten.size.toLong && buf.n == weight
    }

  property("provenance: every estimate is an actual stream element " +
      "(KLL selects, never interpolates)") =
    forAll(Gen.chooseNum(8, 24), Gen.nonEmptyListOf(streamGen), probsGen) {
      (k, parts, probs) =>
        val all = parts.flatten
        all.isEmpty || {
          val agg = KllQuantilesAggregator(k, probs)
          val set = all.toSet
          agg.finish(foldParts(agg, parts)).forall(set.contains)
        }
    }

  property("monotonicity: estimates are non-decreasing in p") =
    forAll(Gen.chooseNum(8, 24), Gen.nonEmptyListOf(streamGen)) { (k, parts) =>
      val probs = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
      val all = parts.flatten
      all.isEmpty || {
        val agg = KllQuantilesAggregator(k, probs)
        val got = agg.finish(foldParts(agg, parts))
        got.sliding(2).forall {
          case Seq(a, b) => a <= b
          case _ => true
        }
      }
    }
}
