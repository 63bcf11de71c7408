package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 1000 terms: "hot" 400×, "warm" 300×, "mild" 200×, t0..t99 1× each
  private def terms = (Seq.fill(400)("hot") ++ Seq.fill(300)("warm") ++
    Seq.fill(200)("mild") ++ (0 until 100).map(i => s"t$i"))
    .toDF("term").repartition(8)

  test("exact when capacity >= distinct terms, partitioning-invariant") {
    val exact = terms.groupBy("term").count().as[(String, Long)].collect().toMap
    def run(parts: Int): Map[String, Long] =
      terms.repartition(parts)
        .agg(HeavyHitters.heavyHitters(200)(col("term")).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select($"e.term", $"e.cnt").as[(String, Long)].collect().toMap
    assert(run(1) === exact)
    assert(run(8) === exact)
  }

  test("MG guarantee: terms above n/(capacity+1) survive, counts never overestimate") {
    val n = 1000L
    val capacity = 9 // threshold n/(k+1) = 100 — hot/warm/mild must survive
    val out = terms
      .agg(HeavyHitters.heavyHitters(capacity)(col("term")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.term", $"e.cnt").as[(String, Long)].collect().toMap
    assert(out.size <= capacity)
    assert(out.contains("hot") && out.contains("warm") && out.contains("mild"), out)
    val exact = Map("hot" -> 400L, "warm" -> 300L, "mild" -> 200L)
    exact.foreach { case (t, c) =>
      assert(out(t) <= c, s"$t overestimated: ${out(t)} > $c")
      assert(out(t) >= c - n / (capacity + 1), s"$t underestimated past bound")
    }
  }

  test("nulls are ignored; empty input yields empty summary") {
    val withNulls = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("term")
    val out = withNulls
      .agg(HeavyHitters.heavyHitters(10)(col("term")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.term", $"e.cnt").as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 2L, "b" -> 1L))
    val empty = Seq.empty[String].toDF("term")
      .agg(HeavyHitters.heavyHitters(10)(col("term")).as("hh"))
      .select(size(col("hh"))).as[Int].head()
    assert(empty === 0)
  }

  test("finish orders by (-count, term)") {
    val out = Seq("b", "a", "b", "c", "a", "b").toDF("term")
      .agg(HeavyHitters.heavyHitters(10)(col("term")).as("hh"))
      .select(col("hh")).as[Seq[HHEntry]].head()
    assert(out === Seq(HHEntry("b", 3), HHEntry("a", 2), HHEntry("c", 1)))
  }
}
