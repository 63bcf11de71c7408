package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the bounded top-k buffer: any fold order and any
  * partitioning of the input must equal global sort-and-take. These are the
  * properties Spark relies on when it partial-aggregates map-side and merges
  * shuffle buffers in arbitrary order.
  */
object TopKAggregatorProps extends Properties("TopKAggregator") {

  // small domains force score/id collisions so tie-handling is exercised
  private val entryGen: Gen[TopKEntry] = for {
    id <- Gen.chooseNum(0L, 40L)
    score <- Gen.chooseNum(-6, 6).map(_ / 2.0)
  } yield TopKEntry(id, score)

  private def refTopK(k: Int, xs: Seq[TopKEntry]): Seq[TopKEntry] =
    xs.sortBy(e => (-e.score, e.id)).take(k)

  property("reduce-fold equals global sort-and-take") =
    forAll(Gen.chooseNum(1, 6), Gen.listOf(entryGen)) { (k, xs) =>
      val agg = TopKAggregator(k)
      xs.foldLeft(agg.zero)(agg.reduce) == refTopK(k, xs)
    }

  property("partitioned partial buffers merge to the same result") =
    forAll(Gen.chooseNum(1, 6), Gen.listOf(Gen.listOf(entryGen))) { (k, parts) =>
      val agg = TopKAggregator(k)
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      merged == refTopK(k, parts.flatten)
    }

  property("merge is order-insensitive across buffers") =
    forAll(Gen.chooseNum(1, 6), Gen.listOf(entryGen), Gen.listOf(entryGen)) { (k, a, b) =>
      val agg = TopKAggregator(k)
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(ba, bb) == agg.merge(bb, ba)
    }
}
