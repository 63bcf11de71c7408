package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DistinctSketchSpec extends SparkSpec {
  import spark.implicits._

  // hash32-style domain: deterministic pseudo-hashes in [0, 2^32)
  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  private val universe: Seq[Long] = (0 until 5000).map(i => h32(s"item$i"))

  test("exact regime: sketch IS the distinct set under any partitioning") {
    // 900 distinct values, each seen 1-3 times, k = 1024 > distinct count
    val vals = universe.take(900).zipWithIndex
      .flatMap { case (v, i) => Seq.fill(i % 3 + 1)(v) }
    val expect = vals.distinct.sorted
    for (parts <- Seq(1, 3, 17)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(DistinctSketch.kmv(1024)(col("h")).as("sk"))
        .select(col("sk")).as[Seq[Long]].head()
      assert(got === expect, s"parts=$parts")
    }
  }

  test("saturated sketch keeps exactly the k smallest distinct values, " +
      "independent of partitioning and input order") {
    val k = 64
    val expect = universe.distinct.sorted.take(k)
    for (parts <- Seq(1, 4, 13); seed <- Seq(1, 2)) {
      val shuffled = new scala.util.Random(seed).shuffle(universe)
      val got = shuffled.toDF("h").repartition(parts)
        .agg(DistinctSketch.kmv(k)(col("h")).as("sk"))
        .select(col("sk")).as[Seq[Long]].head()
      assert(got === expect, s"parts=$parts seed=$seed")
    }
  }

  test("merge is associative and commutative on raw buffers") {
    val agg = KmvAggregator(32)
    val bufs = Seq(
      universe.take(100), universe.slice(50, 300), universe.drop(4000))
      .map(vs => vs.foldLeft(agg.zero)(agg.reduce))
    val Seq(a, b, c) = bufs
    assert(agg.merge(a, b).base === agg.merge(b, a).base)
    assert(agg.merge(agg.merge(a, b), c).base ===
      agg.merge(a, agg.merge(b, c)).base)
    assert(agg.merge(a, agg.zero).base === agg.finish(a))
  }

  test("lossy regime: the (k-1)/U_(k) estimator lands within the " +
      "~1/sqrt(k-2) error regime on a 5000-distinct stream") {
    val k = 256
    val est = universe.toDF("h")
      .agg(DistinctSketch.kmv(k)(col("h")).as("sk"))
      .select(DistinctSketch.estimate(k, col("sk")).as("d"))
      .as[Double].head()
    // std error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"est=$est")
  }

  test("estimate is exact (the set size) below saturation") {
    val est = universe.take(700).toDF("h")
      .agg(DistinctSketch.kmv(1024)(col("h")).as("sk"))
      .select(DistinctSketch.estimate(1024, col("sk")).as("d"))
      .as[Double].head()
    assert(est === 700.0)
  }

  test("union sketch from two sketches equals the sketch of the union") {
    val k = 64
    val aVals = universe.take(2000)
    val bVals = universe.drop(1000) // overlaps a on [1000, 2000)
    val agg = KmvAggregator(k)
    val ska = agg.finish(aVals.foldLeft(agg.zero)(agg.reduce))
    val skb = agg.finish(bVals.foldLeft(agg.zero)(agg.reduce))
    val direct = agg.finish((aVals ++ bVals).foldLeft(agg.zero)(agg.reduce))
    val viaSketches = Seq((ska, skb)).toDF("a", "b")
      .select(DistinctSketch.unionSketch(k, col("a"), col("b")).as("l"))
      .as[Seq[Long]].head()
    assert(viaSketches === direct)
  }

  test("pairwise Jaccard from sketches matches truth within the error " +
      "regime, and is exact when unsaturated") {
    val k = 128
    val aVals = universe.take(1000)
    val bVals = universe.slice(500, 1500) // |A∩B|=500, |A∪B|=1500, J=1/3
    val agg = KmvAggregator(k)
    val ska = agg.finish(aVals.foldLeft(agg.zero)(agg.reduce))
    val skb = agg.finish(bVals.foldLeft(agg.zero)(agg.reduce))
    val row = Seq((ska, skb)).toDF("a", "b")
      .select(DistinctSketch.unionSketch(k, col("a"), col("b")).as("l"),
        col("a"), col("b"))
      .select(
        (size(array_intersect(array_intersect(col("l"), col("a")), col("b")))
          .cast("double") / size(col("l")).cast("double")).as("j"))
      .as[Double].head()
    assert(math.abs(row - 1.0 / 3.0) < 0.20, s"jaccard est=$row")

    // unsaturated: small sets, big k -> exact Jaccard
    val k2 = 4096
    val agg2 = KmvAggregator(k2)
    val sa = agg2.finish(aVals.foldLeft(agg2.zero)(agg2.reduce))
    val sb = agg2.finish(bVals.foldLeft(agg2.zero)(agg2.reduce))
    val exact = Seq((sa, sb)).toDF("a", "b")
      .select(DistinctSketch.unionSketch(k2, col("a"), col("b")).as("l"),
        col("a"), col("b"))
      .select(
        (size(array_intersect(array_intersect(col("l"), col("a")), col("b")))
          .cast("double") / size(col("l")).cast("double")).as("j"))
      .as[Double].head()
    assert(exact === 500.0 / 1500.0)
  }

  test("counted KMV: exact regime reproduces the true join size under " +
      "any partitioning") {
    // A: key i appears i%3+1 times; B: overlapping key range, i%2+1 times
    val aRows = (0 until 300).flatMap(i => Seq.fill(i % 3 + 1)(s"k$i"))
    val bRows = (150 until 450).flatMap(i => Seq.fill(i % 2 + 1)(s"k$i"))
    val truth = (150 until 300).map(i => (i % 3 + 1) * (i % 2 + 1)).sum.toLong
    for (parts <- Seq(1, 7)) {
      val out = graft.operators.Diagnostics.joinSizeEstimate(
          aRows.toDF("ka").repartition(parts), col("ka"),
          bRows.toDF("kb").repartition(parts), col("kb"), k = 1024)
        .as[(Double, Double, Long, Double)].head()
      assert(out._1 === 300.0, s"d_a parts=$parts")
      assert(out._2 === 300.0, s"d_b parts=$parts")
      assert(out._3 === 150L, s"common parts=$parts")
      assert(out._4 === truth.toDouble, s"est parts=$parts")
    }
  }

  test("counted KMV: saturated sketches estimate the join size within " +
      "the correlated-sampling error regime") {
    val aRows = (0 until 3000).flatMap(i => Seq.fill(i % 3 + 1)(s"k$i"))
    val bRows = (1000 until 4000).flatMap(i => Seq.fill(i % 2 + 1)(s"k$i"))
    val truth = (1000 until 3000).map(i => (i % 3 + 1) * (i % 2 + 1)).sum.toDouble
    val out = graft.operators.Diagnostics.joinSizeEstimate(
        aRows.toDF("ka"), col("ka"), bRows.toDF("kb"), col("kb"), k = 512)
      .as[(Double, Double, Long, Double)].head()
    assert(math.abs(out._4 - truth) / truth < 0.30,
      s"est=${out._4} truth=$truth")
    assert(math.abs(out._1 - 3000.0) / 3000.0 < 0.25, s"d_a=${out._1}")
  }

  test("counted KMV: merge is associative/commutative and surviving " +
      "counts are exact (never partial)") {
    val agg = KmvCountedAggregator(16)
    // three streams over a shared small hash space with repeats
    val streams = Seq(
      universe.take(40) ++ universe.take(10),
      universe.slice(20, 60) ++ universe.slice(20, 30),
      universe.slice(5, 45))
    val bufs = streams.map(vs => vs.foldLeft(agg.zero)(agg.reduce))
    val Seq(a, b, c) = bufs
    assert(agg.finish(agg.merge(a, b)) === agg.finish(agg.merge(b, a)))
    assert(agg.finish(agg.merge(agg.merge(a, b), c)) ===
      agg.finish(agg.merge(a, agg.merge(b, c))))
    // surviving counts equal the true multiplicity across all streams
    val all = streams.flatten
    val trueCounts = all.groupBy(identity).map { case (h, v) => h -> v.size.toLong }
    val merged = agg.finish(bufs.reduce(agg.merge))
    merged.foreach { case (h, cnt) =>
      assert(cnt === trueCounts(h), s"hash $h: partial count $cnt")
    }
  }

  test("negative input is rejected (hash-domain contract)") {
    val agg = KmvAggregator(8)
    intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, -1L)
    }
  }
}
