package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic and error-bound laws of the Misra-Gries summary under
  * arbitrary partitionings — the properties Spark relies on when it
  * partial-aggregates map-side and merges shuffle buffers in any order,
  * and the properties the sketch's users rely on when they read the
  * estimates.
  */
object FrequencySketchProps extends Properties("FrequencySketch") {

  // small key domain forces heavy collisions; k sometimes below, sometimes
  // above the distinct-key count so both regimes are exercised
  private val keyGen: Gen[String] = Gen.chooseNum(0, 11).map(i => s"k$i")
  private val streamGen: Gen[List[String]] = Gen.listOf(keyGen)
  private val kGen: Gen[Int] = Gen.chooseNum(1, 16)

  private def truth(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (s, g) => s -> g.size.toLong }

  private def foldParts(agg: HeavyHittersAggregator,
      parts: Seq[Seq[String]]): MgBuf =
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)

  property("estimates never exceed truth and undercount at most n/(k+1), " +
      "any partitioning") =
    forAll(kGen, Gen.listOf(streamGen)) { (k, parts) =>
      val agg = HeavyHittersAggregator(k, k)
      val all = parts.flatten
      val t = truth(all)
      val buf = foldParts(agg, parts)
      agg.finish(buf).forall { case (key, est) =>
        est <= t(key) && est >= t(key) - all.size.toLong / (k + 1)
      }
    }

  property("every key with frequency > n/(k+1) survives, any partitioning") =
    forAll(kGen, Gen.listOf(streamGen)) { (k, parts) =>
      val agg = HeavyHittersAggregator(k, k)
      val all = parts.flatten
      val bound = all.size.toLong / (k + 1)
      val kept = agg.finish(foldParts(agg, parts)).map(_._1).toSet
      truth(all).forall { case (key, c) => c <= bound || kept.contains(key) }
    }

  property("exact regime (distinct keys <= k): any partitioning equals " +
      "exact counts") =
    forAll(Gen.chooseNum(12, 20), Gen.listOf(streamGen)) { (k, parts) =>
      val agg = HeavyHittersAggregator(k, k)
      val expect = truth(parts.flatten).toSeq
        .sortBy { case (s, c) => (-c, s) }
      agg.finish(foldParts(agg, parts)) == expect
    }

  property("merge is commutative on summaries") =
    forAll(kGen, streamGen, streamGen) { (k, a, b) =>
      val agg = HeavyHittersAggregator(k, k)
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      val m1 = agg.merge(ba, bb)
      val m2 = agg.merge(bb, ba)
      m1.n == m2.n && m1.counts == m2.counts
    }

  property("n always counts every non-null input exactly once") =
    forAll(kGen, Gen.listOf(streamGen)) { (k, parts) =>
      val agg = HeavyHittersAggregator(k, k)
      foldParts(agg, parts).n == parts.flatten.size.toLong
    }
}
