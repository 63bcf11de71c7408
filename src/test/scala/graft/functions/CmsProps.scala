package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Count-min laws under arbitrary partitionings — what Spark's map-side
  * partials + any-order merges rely on, and what readers of the estimates
  * rely on: estimates NEVER undercount, the total per row is conserved,
  * and the matrix is partitioning-invariant (exact long addition is
  * associative/commutative).
  */
object CmsProps extends Properties("CountMinSketch") {

  private val keyGen: Gen[String] = Gen.chooseNum(0, 30).map(i => s"k$i")
  private val streamGen: Gen[List[String]] = Gen.listOf(keyGen)

  private def truth(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (s, g) => s -> g.size.toLong }

  private def foldParts(agg: CmsAggregator,
      parts: Seq[Seq[String]]): CmsBuf =
    agg.finish(parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge))

  private def estimate(agg: CmsAggregator, buf: CmsBuf, key: String,
      depth: Int, width: Int): Long =
    (0 until depth).map(r =>
      buf.counters(r * width + CmsAggregator.bucket(r, key, width))).min

  property("estimates never undercount, any partitioning") =
    forAll(Gen.listOf(streamGen)) { parts =>
      val (depth, width) = (4, 8) // narrow: force collisions
      val agg = CmsAggregator(depth, width)
      val t = truth(parts.flatten)
      val buf = foldParts(agg, parts)
      t.forall { case (k, c) => estimate(agg, buf, k, depth, width) >= c }
    }

  property("every row of the matrix sums to n, any partitioning") =
    forAll(Gen.listOf(streamGen)) { parts =>
      val (depth, width) = (4, 8)
      val agg = CmsAggregator(depth, width)
      val buf = foldParts(agg, parts)
      val n = parts.flatten.size.toLong
      (0 until depth).forall(r =>
        buf.counters.slice(r * width, (r + 1) * width).sum == n)
    }

  property("matrix is partitioning-invariant: one-pass fold equals any " +
      "split + merge, merge commutes") =
    forAll(streamGen, streamGen) { (a, b) =>
      val (depth, width) = (4, 8)
      val agg = CmsAggregator(depth, width)
      val one = agg.finish((a ++ b).foldLeft(agg.zero)(agg.reduce))
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      // merge mutates its left buffer: rebuild per order
      val ba2 = a.foldLeft(agg.zero)(agg.reduce)
      val bb2 = b.foldLeft(agg.zero)(agg.reduce)
      val m1 = agg.finish(agg.merge(ba, bb))
      val m2 = agg.finish(agg.merge(bb2, ba2))
      one.counters.toSeq == m1.counters.toSeq &&
        one.counters.toSeq == m2.counters.toSeq
    }

  property("estimate is exact when the key collides with nothing in some " +
      "row (wide matrix, tiny domain)") =
    forAll(streamGen) { xs =>
      val (depth, width) = (4, 4096) // wide: collisions vanishingly rare
      val agg = CmsAggregator(depth, width)
      val t = truth(xs)
      val buf = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      t.forall { case (k, c) => estimate(agg, buf, k, depth, width) == c }
    }
}
