package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the KMV and counted-KMV synopses under arbitrary
  * partitionings — the properties Spark relies on when it partial-
  * aggregates map-side and merges shuffle buffers in any order, and the
  * properties the overlap/join-size estimators read off the sketches.
  */
object DistinctSketchProps extends Properties("DistinctSketch") {

  // small hash domain forces duplicates; k sometimes below, sometimes
  // above the distinct count so both regimes are exercised
  private val hashGen: Gen[Long] = Gen.chooseNum(0L, 40L)
  private val streamGen: Gen[List[Long]] = Gen.listOf(hashGen)
  private val kGen: Gen[Int] = Gen.chooseNum(2, 24)

  private def foldParts(agg: KmvAggregator, parts: Seq[Seq[Long]]): KmvBuf =
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)

  private def foldPartsCnt(agg: KmvCountedAggregator,
      parts: Seq[Seq[Long]]): KmvCntBuf =
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)

  property("sketch is EXACTLY the k smallest distinct values, any " +
      "partitioning") =
    forAll(kGen, Gen.listOf(streamGen)) { (k, parts) =>
      val agg = KmvAggregator(k)
      val expect = parts.flatten.distinct.sorted.take(k)
      agg.finish(foldParts(agg, parts)) == expect
    }

  property("partitioning invariance: one partition == many") =
    forAll(kGen, Gen.listOf(streamGen)) { (k, parts) =>
      val agg = KmvAggregator(k)
      agg.finish(foldParts(agg, parts)) ==
        agg.finish(parts.flatten.foldLeft(agg.zero)(agg.reduce))
    }

  property("counted sketch tracks the k smallest distinct hashes with " +
      "EXACT counts, any partitioning") =
    forAll(kGen, Gen.listOf(streamGen)) { (k, parts) =>
      val agg = KmvCountedAggregator(k)
      val all = parts.flatten
      val t = all.groupBy(identity).map { case (h, g) => h -> g.size.toLong }
      val expect = all.distinct.sorted.take(k).map(h => (h, t(h)))
      agg.finish(foldPartsCnt(agg, parts)) == expect
    }

  property("counted merge == counted single-stream fold") =
    forAll(kGen, Gen.listOf(streamGen)) { (k, parts) =>
      val agg = KmvCountedAggregator(k)
      agg.finish(foldPartsCnt(agg, parts)) ==
        agg.finish(parts.flatten.foldLeft(agg.zero)(agg.reduce))
    }

  property("union sketch law: k smallest of merge(sk(A), sk(B)) == " +
      "sk(A ++ B)") =
    forAll(kGen, streamGen, streamGen) { (k, a, b) =>
      val agg = KmvAggregator(k)
      val ska = a.foldLeft(agg.zero)(agg.reduce)
      val skb = b.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(ska, skb)) ==
        agg.finish((a ++ b).foldLeft(agg.zero)(agg.reduce))
    }
}
