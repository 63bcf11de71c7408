package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FrequencySketchSpec extends SparkSpec {
  import spark.implicits._

  private def mg(k: Int, topN: Int) = HeavyHittersAggregator(k, topN)

  // deterministic synthetic stream: key i appears (i+1)*7 times, i < 40
  private val freqs: Seq[(String, Long)] =
    (0 until 40).map(i => (f"key$i%02d", (i + 1) * 7L))
  private val stream: Seq[String] =
    new scala.util.Random(42)
      .shuffle(freqs.flatMap { case (s, c) => Seq.fill(c.toInt)(s) })

  test("exact regime: capacity >= distinct keys reproduces exact counts " +
      "under any partitioning") {
    for (parts <- Seq(1, 3, 17)) {
      val got = stream.toDF("key").repartition(parts)
        .agg(FrequencySketch.mgTopK(64, 5)(col("key")).as("top"))
        .select(explode(col("top")).as("kv"))
        .select(col("kv._1").as("key"), col("kv._2").as("cnt"))
        .as[(String, Long)].collect().toSeq
      val expect = freqs.sortBy { case (s, c) => (-c, s) }.take(5)
      assert(got === expect, s"parts=$parts")
    }
  }

  test("lossy regime: estimates never exceed truth, undercount at most " +
      "n/(k+1), and every heavy hitter survives") {
    val k = 9
    val n = stream.size.toLong
    val truth = freqs.toMap
    for (parts <- Seq(1, 4, 13)) {
      val got = stream.toDF("key").repartition(parts)
        .agg(FrequencySketch.mgTopK(k, k)(col("key")).as("top"))
        .select(explode(col("top")).as("kv"))
        .select(col("kv._1"), col("kv._2")).as[(String, Long)].collect()
      got.foreach { case (key, est) =>
        val t = truth(key)
        assert(est <= t, s"overcount on $key: $est > $t (parts=$parts)")
        assert(est >= t - n / (k + 1),
          s"undercount beyond bound on $key: $est < $t - ${n / (k + 1)}")
      }
      // any key with frequency > n/(k+1) is guaranteed tracked
      val guaranteed = freqs.filter(_._2 > n / (k + 1)).map(_._1).toSet
      val kept = got.map(_._1).toSet
      assert(guaranteed.subsetOf(kept),
        s"lost heavy hitters ${guaranteed -- kept} (parts=$parts)")
    }
  }

  test("merge is associative on exact summaries and null keys are skipped") {
    val agg = mg(8, 3)
    val xs = Seq("a", "a", "b", null, "c", "a", "b", null)
    val parts = Seq(xs.take(3), xs.slice(3, 5), xs.drop(5))
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val leftFold = agg.merge(agg.merge(parts(0), parts(1)), parts(2))
    val rightFold = agg.merge(parts(0), agg.merge(parts(1), parts(2)))
    assert(agg.finish(leftFold) === agg.finish(rightFold))
    assert(agg.finish(leftFold) === Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    assert(leftFold.n === 6L) // nulls don't count
  }

  test("reduce evicts via the classic decrement when slots are full") {
    val agg = mg(2, 2)
    // a a b -> {a:2, b:1}; c arrives with full slots -> all decrement:
    // {a:1}, c absorbed
    val b = Seq("a", "a", "b", "c").foldLeft(agg.zero)(agg.reduce)
    assert(b.counts === Map("a" -> 1L))
    assert(b.n === 4L)
    // estimates stay <= truth and within n/(k+1)=4/3->1 of it
    assert(agg.finish(b) === Seq(("a", 1L)))
  }

  test("empty and all-null groups yield an empty top list") {
    val agg = mg(4, 2)
    assert(agg.finish(agg.zero) === Seq.empty)
    val nulls = Seq[String](null, null).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(nulls) === Seq.empty)
    assert(agg.merge(agg.zero, nulls).counts === Map.empty)
  }
}
