package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.1, 0.5, 0.9, 0.99)

  test("exact regime (n <= capacity): reproduces percentile_disc " +
      "bit-for-bit, any partitioning") {
    val xs = new scala.util.Random(7).shuffle((1 to 3000).toList)
      .map(i => (i % 5, i * 1.5))
    for (parts <- Seq(1, 7, 32)) {
      val df = xs.toDF("g", "x").repartition(parts)
      val got = df.groupBy(col("g"))
        .agg(QuantileSketch.kllQuantiles(4096, probs)(col("x")).as("qs"))
        .orderBy(col("g"))
        .as[(Int, Seq[Double])].collect()
      val expect = df.groupBy(col("g"))
        .agg(array(probs.map(p => expr(
          s"percentile_disc($p) WITHIN GROUP (ORDER BY x)")): _*).as("qs"))
        .orderBy(col("g"))
        .as[(Int, Seq[Double])].collect()
      assert(got.toSeq === expect.toSeq, s"parts=$parts")
    }
  }

  test("lossy regime: rank error stays within ~3/k of true rank for all " +
      "probed quantiles, across partitionings") {
    val n = 100000
    val k = 256
    val xs = new scala.util.Random(13).shuffle((1 to n).toList).map(_.toDouble)
    for (parts <- Seq(1, 32)) {
      val est = xs.toDF("x").repartition(parts)
        .agg(QuantileSketch.kllQuantiles(k, probs)(col("x")).as("qs"))
        .as[Seq[Double]].head()
      probs.zip(est).foreach { case (p, v) =>
        // values ARE ranks here (1..n), so rank error reads off directly
        val rankErr = math.abs(v / n - p)
        assert(rankErr <= 3.0 / k, s"p=$p est=$v parts=$parts err=$rankErr")
      }
    }
  }

  test("merge is weight-preserving and deterministic: driver-side replay " +
      "of reduce+merge equals the cluster result") {
    val agg = KllQuantilesAggregator(64, probs)
    val xs = (1 to 5000).map(_.toDouble)
    // two different merge trees over the same chunks
    val chunks = xs.grouped(500).toList
    val bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    val leftFold = bufs.reduceLeft(agg.merge)
    val pairTree = bufs.grouped(2).map(_.reduce(agg.merge)).reduce(agg.merge)
    // total weight (= item count) survives any tree
    def weight(b: KllBuf): Long =
      b.levels.zipWithIndex.map { case (lv, h) => lv.size.toLong << h }.sum
    assert(weight(leftFold) === 5000L)
    assert(weight(pairTree) === 5000L)
    assert(leftFold.n === 5000L && pairTree.n === 5000L)
    // both estimates respect the rank-error envelope
    Seq(leftFold, pairTree).foreach { b =>
      probs.zip(agg.finish(b)).foreach { case (p, v) =>
        assert(math.abs(v / 5000 - p) <= 3.0 / 64, s"p=$p v=$v")
      }
    }
  }

  test("sketch size is bounded: 1M items fit in O(k log(n/k)) slots, not n") {
    val agg = KllQuantilesAggregator(128, Seq(0.5))
    val b = (1 to 1000000).foldLeft(agg.zero)((acc, i) => agg.reduce(acc, i.toDouble))
    val slots = b.levels.map(_.size).sum
    assert(slots <= 1024, s"sketch grew to $slots slots")
    assert(b.n === 1000000L)
    val p50 = agg.finish(b).head
    assert(math.abs(p50 / 1000000 - 0.5) <= 3.0 / 128, s"p50=$p50")
  }

  test("NaN inputs are skipped; empty input yields NaN estimates") {
    val agg = KllQuantilesAggregator(64, Seq(0.5))
    val withNaN = Seq(1.0, Double.NaN, 3.0, Double.NaN, 2.0)
      .foldLeft(agg.zero)(agg.reduce)
    assert(withNaN.n === 3L)
    assert(agg.finish(withNaN) === Seq(2.0))
    assert(agg.finish(agg.zero).head.isNaN)
  }
}
